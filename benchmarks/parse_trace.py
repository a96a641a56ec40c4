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


def main(logdir: str = "/tmp/mmu_trace"):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    if not files:
        print(f"no xplane files under {logdir}")
        return 1
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[-1], "rb").read())
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
        tot = sum(totals.values())
        print(f"== {plane.name}: device total {tot / 1e9:.1f} ms ==")
        kinds = defaultdict(int)
        for name, t in items:
            low = name.lower()
            if "custom-call" in low or "_fused_scan" in low:
                k = "pallas_scan"
            elif "conv" in low:
                k = "convolution"
            elif "dot" in low:
                k = "matmul"
            elif "copy" in low or "transpose" in low or "bitcast" in low:
                k = "copy/transpose"
            elif "gather" in low:
                k = "gather"
            elif "scatter" in low:
                k = "scatter"
            elif "fusion" in low:
                k = "fusion(elementwise)"
            else:
                k = "other"
            kinds[k] += t
        for k, t in sorted(kinds.items(), key=lambda kv: -kv[1]):
            print("  %6.2f%%  %8.1f ms  %s" % (100 * t / tot, t / 1e9, k))
        print("-- top ops --")
        for name, t in items[:20]:
            print("  %6.2f%%  %8.2f ms  %s" % (100 * t / tot, t / 1e9, name[:90]))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/mmu_trace"))
