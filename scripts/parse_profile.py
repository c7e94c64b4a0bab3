#!/usr/bin/env python
"""Summarise a jax.profiler trace dir: top device ops by accumulated time.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       python scripts/parse_profile.py /tmp/prof_dir [--top 30] [--steps 5]

Parses the newest ``*.xplane.pb`` directly (the tensorboard profile
plugin's native converter doesn't match this image's TF build) and prints
the "XLA Ops" line of the TPU device plane aggregated by op name, plus
rollups by fusion kind — the quick "where do the milliseconds go" view
used for the round-3 perf passes.  Times are divided by ``--steps`` (the
number of train steps captured; perf_step.py captures 5).
"""

import argparse
import collections
import glob
import os
import re


def find_xplane(trace_dir: str) -> str:
    pats = sorted(
        glob.glob(os.path.join(trace_dir, "plugins", "profile", "*", "*.xplane.pb")),
        key=os.path.getmtime,
    )
    if not pats:
        raise SystemExit(f"no xplane.pb under {trace_dir}/plugins/profile/*/")
    return pats[-1]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--steps", type=int, default=5,
                   help="train steps captured in the trace (divisor)")
    p.add_argument("--group", action="store_true",
                   help="group ops whose names differ only in a trailing "
                        "number (fusion.123 -> fusion)")
    args = p.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(find_xplane(args.trace_dir), "rb") as f:
        xs.ParseFromString(f.read())

    tpu_planes = [pl for pl in xs.planes if "/device:TPU" in pl.name]
    if not tpu_planes:
        raise SystemExit(f"no TPU plane; planes: {[pl.name for pl in xs.planes]}")

    for plane in tpu_planes:
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals = collections.Counter()
        counts = collections.Counter()
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                if args.group:
                    name = re.sub(r"[.\d]+$", "", name)
                totals[name] += ev.duration_ps
                counts[name] += 1
        total_ms = sum(totals.values()) / 1e9
        print(f"== {plane.name}: XLA Ops busy {total_ms:.2f} ms total, "
              f"{total_ms / args.steps:.2f} ms/step over {args.steps} steps")
        print(f"{'ms/step':>9} {'%':>5} {'calls':>6}  op")
        for name, ps in totals.most_common(args.top):
            print(
                f"{ps / 1e9 / args.steps:9.3f} {100 * ps / (total_ms * 1e9):5.1f} "
                f"{counts[name] // args.steps:6d}  {name[:100]}"
            )

        kinds = collections.Counter()
        for name, ps in totals.items():
            kind = re.split(r"[.\d]", name, 1)[0]
            kinds[kind] += ps
        print("\nby op kind (ms/step):")
        for kind, ps in kinds.most_common(15):
            print(f"{ps / 1e9 / args.steps:9.3f} {100 * ps / (total_ms * 1e9):5.1f}  {kind}")


if __name__ == "__main__":
    main()
