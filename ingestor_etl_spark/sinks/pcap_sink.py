"""PCAP file sink (SURVEY §2.1 S7) — debug/interop helper.

sigshark writes flattened/reordered frames back out as classic pcap
(sigshark.py:352-366) so other tools can open them. This engine's
analytics outputs are tables, but the same capability is useful for
debugging decoders: materialize any frames DataFrame (file,
frame_no, ts, dlt, payload) back into .pcap files, one per source
file.

DRIVER-SIDE BY DESIGN: pcap is a sequential container with a single
global header, so frames of one output file cannot be written in
parallel. This sink streams partitions through the driver with
``toLocalIterator`` (bounded memory) — use it for debug extracts,
not bulk exports; bulk re-export at scale would shard into one pcap
per partition instead."""

from __future__ import annotations

import os
import struct
from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _global_header(dlt: int) -> bytes:
    return struct.pack("<IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0, 65535, dlt)


def write_pcap_files(frames: DataFrame, out_dir: str) -> dict[str, int]:
    """Write one classic-pcap per distinct ``file``; frames ordered
    by frame_no (O2 ordering). Returns {output_path: n_frames}."""
    os.makedirs(out_dir, exist_ok=True)
    ordered = (
        frames.where(F.col("payload").isNotNull())
        .select("file", "frame_no", F.unix_micros("ts").alias("ts_us"), "dlt", "payload")
        .orderBy("file", "frame_no")
    )
    handles: dict[str, object] = {}
    counts: dict[str, int] = defaultdict(int)
    try:
        for row in ordered.toLocalIterator():
            base = os.path.basename(str(row.file)).rsplit(".", 1)[0] + ".pcap"
            path = os.path.join(out_dir, base)
            fh = handles.get(path)
            if fh is None:
                fh = open(path, "wb")
                fh.write(_global_header(int(row.dlt)))
                handles[path] = fh
            payload = bytes(row.payload)
            fh.write(
                struct.pack(
                    "<4I",
                    row.ts_us // 1_000_000,
                    row.ts_us % 1_000_000,
                    len(payload),
                    len(payload),
                )
            )
            fh.write(payload)
            counts[path] += 1
    finally:
        for fh in handles.values():
            fh.close()
    return dict(counts)
