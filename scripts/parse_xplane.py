"""Minimal XSpace (xplane.pb) parser: aggregate device event durations.

No tensorflow/tensorboard dependency — walks the protobuf wire format
directly. Prints per-op total duration for the busiest device plane.

Usage: python scripts/parse_xplane.py /tmp/jax-trace [top_n]
"""

import glob
import struct
import sys
from collections import defaultdict


def read_varint(buf, i):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def fields(buf):
    """Yield (field_no, wire_type, value_bytes_or_int) over a message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = read_varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = read_varint(buf, i)
            yield fno, wt, v
        elif wt == 1:
            yield fno, wt, struct.unpack("<q", buf[i : i + 8])[0]
            i += 8
        elif wt == 2:
            ln, i = read_varint(buf, i)
            yield fno, wt, buf[i : i + ln]
            i += ln
        elif wt == 5:
            yield fno, wt, struct.unpack("<i", buf[i : i + 4])[0]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")


def parse_plane(pbuf):
    name = ""
    meta = {}
    lines = []
    for fno, wt, v in fields(pbuf):
        if fno == 2 and wt == 2:
            name = v.decode(errors="replace")
        elif fno == 3 and wt == 2:
            lines.append(v)
        elif fno == 4 and wt == 2:  # map<int64, XEventMetadata>
            k = None
            mname = None
            for f2, w2, v2 in fields(v):
                if f2 == 1 and w2 == 0:
                    k = v2
                elif f2 == 2 and w2 == 2:
                    for f3, w3, v3 in fields(v2):
                        if f3 == 1 and w3 == 0 and k is None:
                            k = v3
                        elif f3 == 2 and w3 == 2:
                            mname = v3.decode(errors="replace")
            if k is not None:
                meta[k] = mname or str(k)
    durs = defaultdict(int)
    counts = defaultdict(int)
    total = 0
    for lbuf in lines:
        lname = ""
        for fno, wt, v in fields(lbuf):
            if fno == 2 and wt == 2:
                lname = v.decode(errors="replace")
        if lname != "XLA Ops":
            continue
        for fno, wt, v in fields(lbuf):
            if fno == 4 and wt == 2:  # XEvent
                mid = 0
                dur = 0
                for f2, w2, v2 in fields(v):
                    if f2 == 1 and w2 == 0:
                        mid = v2
                    elif f2 == 3 and w2 == 0:
                        dur = v2
                nm = meta.get(mid, str(mid))
                durs[nm] += dur
                counts[nm] += 1
                total += dur
    return name, durs, counts, total


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax-trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = glob.glob(f"{root}/**/*.xplane.pb", recursive=True)
    if not paths:
        print("no xplane.pb found under", root)
        return
    buf = open(sorted(paths)[-1], "rb").read()
    planes = []
    for fno, wt, v in fields(buf):
        if fno == 1 and wt == 2:
            planes.append(parse_plane(v))
    planes.sort(key=lambda p: -p[3])
    for name, durs, counts, total in planes[:1]:
        print(f"== plane: {name}  total {total/1e9:.2f} ms (all lines summed)")
        items = sorted(durs.items(), key=lambda kv: -kv[1])
        for nm, d in items[:top_n]:
            print(f"{d/1e9:9.3f} ms  x{counts[nm]:<5d} {nm[:110]}")


if __name__ == "__main__":
    main()
