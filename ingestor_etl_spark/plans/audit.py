"""Whole-registry physical-plan audit.

``audit_all`` builds (not runs) every registered query at a given
scale directory and extracts the plan facts that matter at 100 TB:
exchange count, join strategies, nested-loop/cartesian occurrences,
Python-eval operators in the plan, and scan column pruning. The
results back two artifacts:

- ``PLANS.md`` (written by ``python -m ingestor_etl_spark.plans.audit``):
  the per-query plan inventory committed to the repo so plan
  regressions show up in review diffs;
- ``tests/test_plan_audit.py``: hard global invariants — no
  cartesian products, nested-loop joins only where a side is a
  literal handful of rows (scalar-subquery cross joins), Python
  evaluation only in the decode/multimodal pipelines that are
  documented Arrow-batch surfaces.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ingestor_etl_spark.plans.layout import plan_facts


def _explain(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def audit_query(df) -> dict[str, object]:
    txt = _explain(df)
    facts = plan_facts(df)
    return {
        **facts,
        "nested_loop_joins": txt.count("BroadcastNestedLoopJoin"),
        "cartesian_products": txt.count("CartesianProduct"),
        "python_evals": txt.count("ArrowEvalPython")
        + txt.count("BatchEvalPython")
        + txt.count("FlatMapGroupsInPandas")
        + txt.count("MapInPandas"),
        "sort_merge_joins": facts.get("sort_merge_joins", 0),
        # formatted explain nests the FULL lineage under every cached
        # subtree reuse, so exchange/pyeval counts overstate what
        # actually executes when this is > 0 (the cached stage runs
        # once; each InMemoryTableScan reads the materialized rows)
        "cached_scans": txt.count("InMemoryTableScan"),
    }


def audit_all(spark: SparkSession, sf_dir: str) -> dict[str, dict[str, object]]:
    from ingestor_etl_spark.plans.layout import release_caches
    from ingestor_etl_spark.queries import load_all

    out: dict[str, dict[str, object]] = {}
    for name, q in sorted(load_all().items()):
        df = q.fn(spark, sf_dir)
        out[name] = audit_query(df)
        release_caches()
    return out


def render_markdown(audit: dict[str, dict[str, object]]) -> str:
    lines = [
        "# PLANS — physical-plan audit (generated)",
        "",
        "Run `python -m ingestor_etl_spark.plans.audit` to regenerate.",
        "Columns: exchanges (shuffles), bhj (broadcast hash joins), smj",
        "(sort-merge joins), bnl (broadcast nested loop — only legitimate",
        "for literal-few-row sides), cart (cartesian products — never",
        "legitimate), pyeval (Arrow/Pandas operators — only legitimate in",
        "the documented decode/multimodal surfaces). A non-zero `cached`",
        "means the plan reuses materialized stages: printed exchange/pyeval",
        "counts then overstate what executes (formatted explain nests the",
        "full lineage under every cache reuse).",
        "",
        "| query | exchanges | bhj | smj | bnl | cart | pyeval | cached |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, a in audit.items():
        lines.append(
            f"| {name} | {a['n_exchanges']} | {a['broadcast_joins']} "
            f"| {a['sort_merge_joins']} | {a['nested_loop_joins']} "
            f"| {a['cartesian_products']} | {a['python_evals']} "
            f"| {a['cached_scans']} |"
        )
    return "\n".join(lines) + "\n"


def main() -> None:
    import os

    from ingestor_etl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    audit = audit_all(spark, sf_dir)
    md = render_markdown(audit)
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    with open(os.path.join(repo_root, "PLANS.md"), "w") as fh:
        fh.write(md)
    print(md)


if __name__ == "__main__":
    main()
