#!/usr/bin/env python3
"""Interop check for LabTable.write parquet output: the footer must
carry `file_metadata` / `type` key-value entries whose bytes match the
reference's pyarrow footer layout (util.py:56-71).

Usage: python3 tools/footer_check.py <written_dir> [golden_json]
Exit 0 iff the keys exist (and, with a golden, byte-match it).
"""
import glob, sys

import pyarrow.parquet as pq

d = sys.argv[1]
parts = glob.glob(d + "/*.parquet")
if not parts:
    sys.exit(f"no parquet parts under {d}")
ok = True
for part in parts:
    md = pq.ParquetFile(part).metadata.metadata or {}
    if b"file_metadata" not in md or b"type" not in md:
        print(f"MISSING footer keys in {part}: {sorted(md)}")
        ok = False
        continue
    if len(sys.argv) > 2:
        golden = open(sys.argv[2], "rb").read()
        if md[b"file_metadata"] != golden:
            print(f"MISMATCH file_metadata bytes in {part}")
            ok = False
            continue
    print(f"OK {part}: type={md[b'type'].decode()}")
sys.exit(0 if ok else 1)
