#!/usr/bin/env python
"""Per-bucket roofline decomposition of a jax.profiler trace (TPU).

For every XLA op event the xplane records XLA's own cost numbers —
``flops``, ``bytes_accessed`` and the chip peaks (``peak_teraflops_per_
second``, ``peak_hbm_bw_gigabytes_per_second``).  Each op's roofline
bound is

    bound = max(flops / peak_flops, bytes_accessed / peak_hbm_bw)

and ``headroom = busy_time - bound`` is the time NOT explained by either
roof: layout fallbacks (batch-in-lanes convs), underfilled tiles, serial
dependencies, fixed overheads.  Summed over the step this upper-bounds
what ANY pure scheduling/layout optimisation could recover — algorithmic
changes (fewer FLOPs / fewer bytes) are the only way below the bound.

Caveat: per-op bounds ignore overlap — two ops can't use the same HBM
port at once, so sum(bound) is itself optimistic; conversely an op
hidden behind another's MXU time costs nothing even with poor headroom.
The summary therefore reports both the per-op headroom total and the
step-level roofline (total flops / peak, total bytes / peak).

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       python scripts/roofline.py /tmp/prof_dir [--steps 5] [--top 25]
       [--markdown]
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
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--top", type=int, default=25,
                   help="ops listed in the per-op headroom table")
    p.add_argument("--markdown", action="store_true")
    args = p.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(find_xplane(args.trace_dir), "rb") as f:
        xs.ParseFromString(f.read())

    plane = next(pl for pl in xs.planes if "/device:TPU" in pl.name)
    smeta = {m.id: m.name for m in plane.stat_metadata.values()}

    # XLA's per-op cost numbers (flops / bytes_accessed / hlo_category /
    # source) live on the EVENT METADATA's stats, not on the events
    def sval(st):
        return float(st.double_value or st.int64_value or st.uint64_value)

    info = {}
    for m in plane.event_metadata.values():
        d = dict(name=m.name, flops=0.0, bytes=0.0, category="", src="")
        for st in m.stats:
            key = smeta.get(st.metadata_id, "")
            if key == "flops":
                d["flops"] = sval(st)
            elif key == "bytes_accessed":
                d["bytes"] = sval(st)
            elif key == "hlo_category":
                d["category"] = st.str_value
            elif key == "tf_op":
                d["src"] = st.str_value
        info[m.id] = d

    # accumulate busy time per op
    acc = collections.defaultdict(lambda: dict(ps=0, calls=0))
    peak_tf = peak_bw = None
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            a = acc[ev.metadata_id]
            a["ps"] += ev.duration_ps
            a["calls"] += 1
    for st in plane.stats:
        key = smeta.get(st.metadata_id, "")
        if key == "peak_teraflops_per_second":
            peak_tf = sval(st)
        elif key == "peak_hbm_bw_gigabytes_per_second":
            peak_bw = sval(st)

    if not acc:
        raise SystemExit("no XLA Ops line in the TPU plane")
    # fall back to public v5e specs if the stats are missing
    peak_tf = peak_tf or 197.0
    peak_bw = peak_bw or 819.0

    rows = []
    for mid, a in acc.items():
        d = info.get(mid, dict(name=str(mid), flops=0.0, bytes=0.0,
                               category="", src=""))
        t_ms = a["ps"] / 1e9 / args.steps
        ncalls = a["calls"] / args.steps
        flops = d["flops"] * ncalls
        byts = d["bytes"] * ncalls
        t_mxu = flops / (peak_tf * 1e12) * 1e3
        t_hbm = byts / (peak_bw * 1e9) * 1e3
        bound = max(t_mxu, t_hbm)
        rows.append(dict(
            name=d["name"], category=d["category"] or "?", t=t_ms,
            t_mxu=t_mxu, t_hbm=t_hbm, bound=bound,
            headroom=max(0.0, t_ms - bound),
            limiter=("MXU" if t_mxu >= t_hbm else "HBM"),
            calls=int(ncalls), src=d["src"],
        ))

    total_t = sum(r["t"] for r in rows)
    total_bound = sum(r["bound"] for r in rows)
    total_head = sum(r["headroom"] for r in rows)
    step_flops = sum(r["t_mxu"] for r in rows) * (peak_tf * 1e12) / 1e3
    step_bytes = sum(r["t_hbm"] for r in rows) * (peak_bw * 1e9) / 1e3

    sep = "|" if args.markdown else ""
    def pr(*cols, widths=(40, 10, 9, 9, 9, 9, 6)):
        if args.markdown:
            print("| " + " | ".join(str(c) for c in cols) + " |")
        else:
            print("  ".join(f"{str(c):<{w}}" for c, w in zip(cols, widths)))

    # A `while` op's event SPANS its whole loop execution, and the body ops
    # ALSO record their own events on the same line — so while rows double-
    # count their children's busy time, and their flops/bytes metadata count
    # the body ONCE (not x trip-count).  Report the while spans separately:
    # busy-excluding-while + the child ops' own rows is the honest per-op
    # accounting; (while_span - children_busy) is loop overhead, which we
    # can bound by wall - busy_excl_while.
    while_span = sum(r["t"] for r in rows if r["category"] == "while")
    busy_excl = total_t - while_span
    bound_excl = total_bound - sum(
        r["bound"] for r in rows if r["category"] == "while")
    head_excl = total_head - sum(
        r["headroom"] for r in rows if r["category"] == "while")

    print(f"peaks: {peak_tf:.0f} TFLOP/s, {peak_bw:.0f} GB/s HBM   "
          f"steps assumed: {args.steps} (divisor, not detected — must match "
          "the traced region)")
    print(f"device busy: {total_t:.2f} ms/step | per-op roofline bound "
          f"sum: {total_bound:.2f} ms | per-op headroom sum: "
          f"{total_head:.2f} ms")
    if while_span > 0:
        print(f"NOTE while spans: {while_span:.2f} ms/step double-count "
              "their body ops (which also record their own events) and "
              "their flops/bytes count the body once, not x trip-count.")
        print(f"excluding while rows: busy {busy_excl:.2f} ms/step | "
              f"bound {bound_excl:.2f} ms | headroom {head_excl:.2f} ms")
    print(f"step totals: {step_flops/1e12:.2f} TFLOP -> "
          f"{step_flops/(peak_tf*1e12)*1e3:.1f} ms MXU roof | "
          f"{step_bytes/1e9:.1f} GB -> "
          f"{step_bytes/(peak_bw*1e9)*1e3:.1f} ms HBM roof")
    print()

    # by category
    cats = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0.0, 0.0])
    for r in rows:
        c = cats[r["category"]]
        c[0] += r["t"]; c[1] += r["t_mxu"]; c[2] += r["t_hbm"]
        c[3] += r["bound"]; c[4] += r["headroom"]
    pr("category", "ms/step", "mxu_ms", "hbm_ms", "bound", "headroom", "")
    if args.markdown:
        print("|---|---|---|---|---|---|---|")
    for cat, (t, tm, th, b, h) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        pr(cat, f"{t:.2f}", f"{tm:.2f}", f"{th:.2f}", f"{b:.2f}", f"{h:.2f}", "")
    print()

    rows.sort(key=lambda r: -r["headroom"])
    pr("top headroom ops", "ms/step", "bound", "headrm", "lim", "calls", "")
    if args.markdown:
        print("|---|---|---|---|---|---|---|")
    for r in rows[: args.top]:
        nm = re.sub(r" = .*", "", r["name"])[:60]
        pr(nm, f"{r['t']:.3f}", f"{r['bound']:.3f}", f"{r['headroom']:.3f}",
           r["limiter"], r["calls"], "")


if __name__ == "__main__":
    main()
