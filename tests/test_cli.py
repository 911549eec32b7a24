"""CLI entry (`python -m ingestor_etl_spark`) — the reference's
per-protocol command-line ingestors (diameter.py:616-629 etc.) as
one command: capture glob → pipeline → table + ingestion ledger."""

from __future__ import annotations

import glob

from ingestor_etl_spark.__main__ import main
from ingestor_etl_spark.sinks.ledger import current_ledger_state
from tests import pcapgen as g
from tests.test_diameter import _cca, _ccr


def test_cli_diameter_batch(spark, tmp_path):
    drop = tmp_path / "caps"
    drop.mkdir()
    ccr, cca = _ccr(), _cca()
    frames = [
        (2400, 0, g.eth(g.ipv4(g.sctp([(1, 0, 46, ccr)], 40001, 3868), 132))),
        (2401, 0, g.eth(g.ipv4(g.sctp([(1, 0, 46, cca)], 3868, 40001), 132,
                               src="10.0.0.2", dst="10.0.0.1"))),
    ]
    (drop / "cap1.pcap").write_bytes(g.pcap(frames))
    out, ledger = str(tmp_path / "table"), str(tmp_path / "ledger")

    rc = main([
        "--protocol", "diameter",
        "--input", str(drop) + "/*.pcap",
        "--out", out,
        "--ledger", ledger,
    ])
    assert rc == 0
    got = spark.read.parquet(out).toPandas()
    # req+ans merge into one correlated row (J1 full-outer)
    assert len(got) == 1 and bool(got.matched.all())
    state = current_ledger_state(spark, ledger).toPandas()
    assert len(state) == 1 and state.iloc[0].processed == 2


def test_cli_gtp_batch(spark, tmp_path):
    req = g.gtpv2(32, 0, 777, g.gtpv2_ie(1, g.tbcd("334020000000001")))
    res = g.gtpv2(33, 1, 777, g.gtpv2_ie(2, b"\x10\x00"))
    frames = [
        (1800, 0, g.eth(g.ipv4(g.udp(req, 40000, 2123), 17))),
        (1800, 1, g.eth(g.ipv4(g.udp(res, 2123, 40000), 17,
                               src="10.0.0.2", dst="10.0.0.1"))),
    ]
    drop = tmp_path / "caps2"
    drop.mkdir()
    (drop / "cap1.pcap").write_bytes(g.pcap(frames))
    out = str(tmp_path / "table2")
    rc = main([
        "--protocol", "gtp",
        "--input", str(drop) + "/*.pcap",
        "--out", out,
    ])
    assert rc == 0
    assert len(glob.glob(out + "/*.parquet")) >= 1
    assert spark.read.parquet(out).count() >= 1


def test_cli_query_mode_writes_parquet(spark, tmp_path):
    from ingestor_etl_spark.__main__ import main

    out = str(tmp_path / "card")
    assert main([
        "--query", "dataset_card",
        "--sf-dir", "/root/testdata/sf0.001",
        "--out", out,
    ]) == 0
    got = spark.read.parquet(out).collect()
    assert len(got) == 1 and got[0].n_docs == 500


def test_cli_list_queries(capsys):
    from ingestor_etl_spark.__main__ import main

    assert main(["--list-queries"]) == 0
    names = [l.split("\t")[0] for l in capsys.readouterr().out.splitlines()]
    assert "q1_pricing_summary" in names and "pagerank_dup_graph" in names
