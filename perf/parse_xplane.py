"""Minimal XSpace/XPlane protobuf reader: per-op device-time breakdown.

The env's tensorboard_plugin_profile cannot convert xplane dumps (its
native converter mismatches the installed TF), so this parses the wire
format directly with the known field numbers of xplane.proto
(tensorflow/tsl/profiler/protobuf/xplane.proto) and aggregates XEvent
durations by op-metadata name per plane.

Usage: python perf/parse_xplane.py /tmp/jaxtrace [--top 40] [--plane TPU]
"""

import argparse
import collections
import glob
import os
import sys


def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) for one message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wt == 1:  # 64-bit
            val = int.from_bytes(buf[pos:pos + 8], "little")
            pos += 8
        elif wt == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:  # 32-bit
            val = int.from_bytes(buf[pos:pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield field, wt, val


def parse_plane(buf):
    """XPlane -> (name, {metadata_id: name}, [(metadata_id, dur_ps)])."""
    name = ""
    meta = {}
    events = []
    for field, _, val in _fields(buf):
        if field == 2:
            name = val.decode()
        elif field == 4:  # map<int64, XEventMetadata>
            k = v = None
            for f2, _, v2 in _fields(val):
                if f2 == 1:
                    k = v2
                elif f2 == 2:
                    v = v2
            if v is not None:
                mname = mid = None
                for f3, _, v3 in _fields(v):
                    if f3 == 1:
                        mid = v3
                    elif f3 == 2:
                        mname = v3.decode()
                meta[mid if mid is not None else k] = mname or ""
        elif field == 3:  # XLine
            for f2, _, v2 in _fields(val):
                if f2 == 4:  # XEvent
                    mid = dur = occ = None
                    for f3, wt3, v3 in _fields(v2):
                        if f3 == 1:
                            mid = v3
                        elif f3 == 3:
                            dur = v3
                        elif f3 == 5:
                            occ = v3
                    if mid is not None and dur is not None:
                        events.append((mid, dur, occ or 1))
    return name, meta, events


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--plane", default=None,
                    help="substring filter on plane name (e.g. TPU)")
    args = ap.parse_args()

    pats = [os.path.join(args.logdir, "plugins/profile/*/*.xplane.pb"),
            os.path.join(args.logdir, "*.xplane.pb")]
    files = sum((glob.glob(p) for p in pats), [])
    if not files:
        sys.exit(f"no xplane.pb under {args.logdir}")
    buf = open(sorted(files)[-1], "rb").read()

    for field, _, val in _fields(buf):
        if field != 1:
            continue
        name, meta, events = parse_plane(val)
        if args.plane and args.plane.lower() not in name.lower():
            continue
        if not events:
            continue
        agg = collections.defaultdict(lambda: [0, 0])
        for mid, dur, occ in events:
            a = agg[meta.get(mid, str(mid))]
            a[0] += dur
            a[1] += occ
        total = sum(a[0] for a in agg.values())
        print(f"\n=== plane: {name}  total {total / 1e9:.3f} ms "
              f"({len(events)} events) ===")
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:args.top]
        for opname, (dur, occ) in rows:
            print(f"{dur / 1e9:10.3f} ms {100 * dur / total:5.1f}% "
                  f"x{occ:<7d} {opname[:110]}")


if __name__ == "__main__":
    main()
