"""Parse a jax.profiler xplane trace into an op-category breakdown.

Usage:
    with mm_unet_tpu.utils.profiling.trace("/tmp/mmu_trace"): ...steps...
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python benchmarks/parse_trace.py /tmp/mmu_trace
"""

from __future__ import annotations

import glob
import sys
from collections import defaultdict


# Classify by the op's own HLO kind — the token before the operand
# list — NOT by substring over the whole text (operand names like
# %copy-done.123 inside a fusion's operand list previously
# miscategorized elementwise fusions as copies, inflating the
# copy/transpose share ~3x in the round-2 numbers).
def _kind_of(name):
    for k in ("custom-call", "convolution", "select-and-scatter",
              "dot", "copy", "transpose", "bitcast", "gather",
              "scatter", "dynamic-slice", "dynamic-update-slice",
              "fusion", "reduce-window", "reduce", "slice", "pad",
              "concatenate", "iota", "broadcast", "convert"):
        if f" {k}(" in name:
            return k
    return "other"


_CAT = {
    "custom-call": "pallas_scan", "convolution": "convolution",
    "select-and-scatter": "convolution", "reduce-window": "convolution",
    "dot": "matmul", "copy": "copy/transpose",
    "transpose": "copy/transpose", "bitcast": "copy/transpose",
    "gather": "gather", "scatter": "scatter",
    "dynamic-slice": "copy/transpose",
    "dynamic-update-slice": "copy/transpose",
    "slice": "copy/transpose", "pad": "copy/transpose",
    "concatenate": "copy/transpose",
    "fusion": "fusion(elementwise)",
}


def categorize(logdir: str = "/tmp/mmu_trace"):
    """Parse the newest xplane trace under `logdir` into
    `(category->ms, [(op_name, ms) sorted])` for the TPU device plane."""
    import os
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    if not files:
        raise FileNotFoundError(f"no xplane files under {logdir}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(files, key=lambda f: __import__("os").path.getmtime(f))[-1], "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        md = plane.event_metadata
        totals = defaultdict(int)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                totals[md[ev.metadata_id].name] += ev.duration_ps
        items = sorted(totals.items(), key=lambda kv: -kv[1])
        kinds = defaultdict(int)
        for name, t in items:
            cat = _CAT.get(_kind_of(name), "other")
            if cat == "fusion(elementwise)":
                # a fused conv keeps 'convolution' in the fusion's own name
                head = name.lstrip("%").split(" ", 1)[0]
                if "convolution" in head:
                    cat = "convolution"
                elif head.startswith(("copy", "transpose", "bitcast")):
                    cat = "copy/transpose"
            kinds[cat] += t
        return (
            {k: t / 1e9 for k, t in kinds.items()},
            [(name, t / 1e9) for name, t in items],
        )
    raise RuntimeError("no TPU plane in trace")


def main(logdir: str = "/tmp/mmu_trace", as_json: bool = False):
    try:
        kinds, items = categorize(logdir)
    except FileNotFoundError as e:
        print(e)
        return 1
    if as_json:
        import json
        print(json.dumps(kinds))
        return 0
    tot = sum(kinds.values())
    print(f"== device total {tot:.1f} ms ==")
    for k, t in sorted(kinds.items(), key=lambda kv: -kv[1]):
        print("  %6.2f%%  %8.1f ms  %s" % (100 * t / tot, t, k))
    print("-- top ops --")
    for name, t in items[:20]:
        print("  %6.2f%%  %8.2f ms  %s" % (100 * t / tot, t, name[:90]))
    # per-category top ops (where do the copies/fusions actually come from?)
    for want in ("copy/transpose", "fusion(elementwise)", "other"):
        print(f"-- top {want} --")
        shown = 0
        for name, t in items:
            cat = _CAT.get(_kind_of(name), "other")
            if cat == "fusion(elementwise)":
                head = name.lstrip("%").split(" ", 1)[0]
                if "convolution" in head:
                    cat = "convolution"
                elif head.startswith(("copy", "transpose", "bitcast")):
                    cat = "copy/transpose"
            if cat != want:
                continue
            print("  %6.2f%%  %8.2f ms  %s" % (100 * t / tot, t, name[:140]))
            shown += 1
            if shown >= 12:
                break
    return 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--json"]
    sys.exit(main(args[0] if args else "/tmp/mmu_trace", "--json" in sys.argv))
