#!/usr/bin/env python
"""Sweep the container's REAL third-party files through this repo's
per-blob decoders (r14 rule: a reader proven only against its own
writer misses the wild's default layouts — the 7z SubStreamsInfo and
CFB v4 finds both came from exactly this).

For every format with real fixtures present (png/gif/bmp/tiff/jpeg/
webp/wav/zip/tar/pdf/7z/mp3), run the decoder and tally:

- ``decoded``  — full parse succeeded;
- ``refused``  — clean ValueError (the documented marker-row
  contract: unsupported profile, refusal arm);
- ``CRASH``    — any other exception: ALWAYS a bug (the operator
  boundary contract says codec errors convert to ValueError).

Prints one JSON line per format plus per-file detail for crashes and
the most common refusal reasons. No Spark session — pure Python, safe
to run beside a gate.

Usage: python scripts/real_fixture_sweep.py [max_per_format]
"""

from __future__ import annotations

import collections
import json
import os
import random
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoopxmlextractor_spark.operators import containers as C  # noqa: E402
from hadoopxmlextractor_spark.operators import documents as D  # noqa: E402
from hadoopxmlextractor_spark.operators import jpeg as J  # noqa: E402
from hadoopxmlextractor_spark.operators import mp3 as M  # noqa: E402
from hadoopxmlextractor_spark.operators import multimodal as MM  # noqa: E402

MAX = int(sys.argv[1]) if len(sys.argv) > 1 else 40

DECODERS = {
    "png": lambda b: MM._decode_png(b),
    "gif": lambda b: MM._decode_gif(b),
    "bmp": lambda b: MM._decode_bmp(b),
    "tiff": lambda b: MM._decode_tiff(b),
    "jpg": lambda b: J.decode_jpeg(b),
    "jpeg": lambda b: J.decode_jpeg(b),
    "webp": lambda b: C._parse_webp_meta(b),
    "wav": lambda b: MM._decode_wav(b),
    "zip": lambda b: D.zip_member_list(b),
    "tar": lambda b: D.tar_members(b),
    "pdf": lambda b: D._pdf_extract(b),
    "7z": lambda b: D.sevenzip_members(b),
    "mp3": lambda b: (C.mp3_frame_info(b), M.mp3_spectral_stats(b)),
}

SKIP_DIRS = ("/proc", "/sys", "/root/repo", "/tmp")


def find_files() -> dict[str, list[str]]:
    out = subprocess.run(
        ["find", "/", "-type", "f", "-size", "+0"]
        + [a for d in SKIP_DIRS for a in ("-not", "-path", d + "/*")],
        capture_output=True, text=True,
    ).stdout.splitlines()
    by: dict[str, list[str]] = collections.defaultdict(list)
    for f in out:
        e = f.rsplit(".", 1)[-1].lower() if "." in f else ""
        if e in DECODERS:
            by[e].append(f)
    return by


def main() -> None:
    random.seed(14)
    by = find_files()
    for ext in sorted(DECODERS):
        files = by.get(ext, [])
        if not files:
            continue
        sample = files if len(files) <= MAX else random.sample(
            files, MAX
        )
        counts = collections.Counter()
        refusals = collections.Counter()
        crashes = []
        for path in sample:
            try:
                blob = open(path, "rb").read()
            except OSError:
                continue
            try:
                DECODERS[ext](blob)
                counts["decoded"] += 1
            except ValueError as e:
                counts["refused"] += 1
                refusals[str(e)[:70]] += 1
            except Exception as e:  # noqa: BLE001 — the tally's point
                counts["CRASH"] += 1
                crashes.append((path, f"{type(e).__name__}: {e}"))
        print(json.dumps({
            "format": ext, "total_found": len(files),
            "sampled": len(sample), **counts,
            "top_refusals": refusals.most_common(4),
        }))
        for path, err in crashes:
            print(f"  CRASH {path}: {err}")


if __name__ == "__main__":
    main()
