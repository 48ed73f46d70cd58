#!/usr/bin/env python
"""Print scalars from a run's tfevents file (dependency-free).

The training monitor for this repo during long TPU runs: reads the
records written by quadruped_tpu/utils/tb.py (plain tfevents framing) and
prints one line per step for the selected tags.

Usage:
    python tools/watch_tfevents.py logs/<run>/ [tag-substring ...]
    python tools/watch_tfevents.py logs/<run>/ reward steps_per_sec --tail 5
"""

from __future__ import annotations

import argparse
import glob
import os
import struct
import sys
from collections import defaultdict


def read_scalars(path: str):
    """Yield (step, tag, value) from a tfevents file."""
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    while off + 12 <= len(data):
        (n,) = struct.unpack("<Q", data[off : off + 8])
        off += 12
        payload = data[off : off + n]
        off += n + 4
        # Event proto: field 1 wall_time (fixed64), field 2 step (varint),
        # field 5 summary -> Summary.value (field 1) -> tag (1) value (2/
        # simple_value field 2 = float).  tb.py writes exactly this shape;
        # parse it positionally rather than pulling in protobuf.
        step, tag, value = _parse_event(payload)
        if tag is not None:
            yield step, tag, value


def _varint(buf, i):
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _parse_event(p):
    i = 0
    step = 0
    tag = None
    value = None
    while i < len(p):
        key, i = _varint(p, i)
        fieldno, wire = key >> 3, key & 7
        if wire == 1:  # fixed64
            i += 8
        elif wire == 0:
            v, i = _varint(p, i)
            if fieldno == 2:
                step = v
        elif wire == 5:  # fixed32
            i += 4
        elif wire == 2:  # length-delimited
            ln, i = _varint(p, i)
            sub = p[i : i + ln]
            i += ln
            if fieldno == 5:  # summary
                tag, value = _parse_summary(sub)
        else:
            break
    return step, tag, value


def _parse_summary(p):
    i = 0
    while i < len(p):
        key, i = _varint(p, i)
        fieldno, wire = key >> 3, key & 7
        if wire == 2:
            ln, i = _varint(p, i)
            sub = p[i : i + ln]
            i += ln
            if fieldno == 1:  # Summary.value
                j = 0
                tag = None
                val = None
                while j < len(sub):
                    k2, j = _varint(sub, j)
                    f2, w2 = k2 >> 3, k2 & 7
                    if w2 == 2:
                        l2, j = _varint(sub, j)
                        if f2 == 1:
                            tag = sub[j : j + l2].decode()
                        j += l2
                    elif w2 == 5:
                        if f2 == 2:
                            (val,) = struct.unpack("<f", sub[j : j + 4])
                        j += 4
                    elif w2 == 0:
                        _, j = _varint(sub, j)
                    elif w2 == 1:
                        j += 8
                return tag, val
        elif wire == 0:
            _, i = _varint(p, i)
        elif wire == 1:
            i += 8
        elif wire == 5:
            i += 4
    return None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("tags", nargs="*", default=[])
    ap.add_argument("--tail", type=int, default=0,
                    help="only the last N steps per tag")
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(args.run_dir, "events.out.tfevents.*")))
    if not files:
        files = [args.run_dir]  # direct file path
    series = defaultdict(list)
    for f in files:
        for step, tag, value in read_scalars(f):
            if not args.tags or any(t in tag for t in args.tags):
                series[tag].append((step, value))
    for tag in sorted(series):
        pts = series[tag]
        if args.tail:
            pts = pts[-args.tail :]
        print(tag)
        for step, v in pts:
            print(f"  {step:>14,}  {v:.4f}")


if __name__ == "__main__":
    main()
