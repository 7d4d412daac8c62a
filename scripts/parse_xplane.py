"""Op-level breakdown of a jax.profiler trace (.xplane.pb) without TF.

    python scripts/parse_xplane.py <trace_dir_or_xplane.pb> [--top 40]
        [--by op|category|scope] [--scope-depth 4] [--contains SUBSTR]

Reads the TPU device plane's "XLA Ops" line (sync ops only — the async
copy/slice lines overlap compute and would double-count), sums the
device_duration_ps stat per key, and prints a table with aggregate FLOPs
and bytes so each group can be checked against the chip's roofline.
Views: `--by op` (deduplicated HLO op), `--by category` (hlo_category),
`--by scope` (leading path of the jax scope annotation, tf_op).  The .proto
mirror lives next to this script; compiled on the fly with protoc.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import subprocess
import sys


def load_pb2():
    here = os.path.dirname(os.path.abspath(__file__))
    out = "/tmp/conductor_xplane_pb2"
    os.makedirs(out, exist_ok=True)
    if not os.path.exists(os.path.join(out, "xplane_pb2.py")):
        subprocess.run(
            ["protoc", f"-I{here}", f"--python_out={out}", "xplane.proto"],
            check=True,
        )
    sys.path.insert(0, out)
    import xplane_pb2  # type: ignore

    return xplane_pb2


def find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True))
    if not hits:
        raise SystemExit(f"no .xplane.pb under {path}")
    return hits[-1]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by", choices=("op", "category", "scope"), default="op")
    ap.add_argument("--scope-depth", type=int, default=4)
    ap.add_argument("--contains", default=None,
                    help="only ops whose scope or name contains this")
    ap.add_argument("--plane-filter", default="TPU")
    args = ap.parse_args()

    pb2 = load_pb2()
    fn = find_xplane(args.path)
    space = pb2.XSpace()
    with open(fn, "rb") as f:
        space.ParseFromString(f.read())

    planes = [p for p in space.planes if args.plane_filter in p.name]
    if not planes:
        print("planes available:", [p.name for p in space.planes])
        raise SystemExit(f"no plane matching {args.plane_filter!r}")

    tot_us = collections.defaultdict(float)
    tot_flops = collections.defaultdict(int)
    tot_bytes = collections.defaultdict(int)
    counts = collections.defaultdict(int)
    grand = 0.0
    for plane in planes:
        stat_names = {k: v.name for k, v in plane.stat_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                mdstats = {
                    stat_names.get(s.metadata_id): s for s in md.stats
                }
                evstats = {stat_names.get(s.metadata_id): s for s in ev.stats}
                dur_ps = (
                    evstats["device_duration_ps"].uint64_value
                    if "device_duration_ps" in evstats
                    else ev.duration_ps
                )
                cat = (
                    mdstats["hlo_category"].str_value
                    if "hlo_category" in mdstats else "?"
                )
                scope = (
                    mdstats["tf_op"].str_value if "tf_op" in mdstats else ""
                )
                if args.contains and args.contains not in scope and \
                        args.contains not in md.name:
                    continue
                if args.by == "op":
                    key = (
                        mdstats["deduplicated_name"].str_value
                        if "deduplicated_name" in mdstats and
                        mdstats["deduplicated_name"].str_value
                        else md.display_name or md.name.split(" = ")[0]
                    )
                    key = re.sub(r"\.\d+$", "", key) + f"  [{cat}]"
                elif args.by == "category":
                    key = cat
                else:
                    parts = scope.split("/")
                    key = "/".join(parts[: args.scope_depth]) or "(no scope)"
                us = dur_ps / 1e6
                tot_us[key] += us
                counts[key] += 1
                grand += us
                if "flops" in mdstats:
                    tot_flops[key] += mdstats["flops"].int64_value
                if "bytes_accessed" in mdstats:
                    tot_bytes[key] += mdstats["bytes_accessed"].int64_value

    if not tot_us:
        raise SystemExit("no events matched")

    print(f"# {fn}")
    print(f"# total device time {grand/1e3:.2f} ms "
          f"(all sync XLA ops over the traced window)")
    print(f"{'ms':>10} {'%':>6} {'n':>6} {'GFLOP':>8} {'GB':>7} "
          f"{'TF/s':>6} {'GB/s':>7}  key")
    for key, us in sorted(tot_us.items(), key=lambda kv: -kv[1])[: args.top]:
        sec = us / 1e6
        gflop = tot_flops[key] / 1e9
        gb = tot_bytes[key] / 1e9
        print(
            f"{us/1e3:10.2f} {100*us/grand:6.2f} {counts[key]:6d} "
            f"{gflop:8.2f} {gb:7.3f} "
            f"{gflop/sec/1e3 if sec else 0:6.1f} {gb/sec if sec else 0:7.1f}  {key}"
        )


if __name__ == "__main__":
    main()
