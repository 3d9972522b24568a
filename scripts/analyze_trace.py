"""Summarize a JAX xplane trace: per-op time grouped by op family.

Usage: python scripts/analyze_trace.py /tmp/trace_dir [n_steps]

Reads the synchronous 'XLA Ops' line of the TPU device plane, strips
instruction-id suffixes so repeated fusions aggregate, prints the top
ops and a family rollup (conv / pallas / copy / other).
"""
import collections
import glob
import re
import sys


def load_xspace(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    f = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.xplane.pb"))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(f, "rb").read())
    return xs


def op_events(trace_dir):
    xs = load_xspace(trace_dir)
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                yield name, ev.duration_ps / 1e9
        return


_FAMILY_PATTERNS = [
    ("conv", re.compile(r"convolution|conv_general")),
    ("pallas", re.compile(r"gather_kernel|scatter_rows|outer_|mlp_chain|"
                          r"pathnet|custom-call|tpu_custom_call")),
    ("copy", re.compile(r"^%?(copy|transpose|bitcast|slice|dynamic-slice|"
                        r"concatenate|pad|reshape)")),
    ("fusion", re.compile(r"^%?(fusion|loop_|input_|output_)")),
]


def family_of(name):
    for fam, pat in _FAMILY_PATTERNS:
        if pat.search(name):
            return fam
    return "other"


def main():
    trace_dir = sys.argv[1]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    stats = collections.defaultdict(float)
    counts = collections.defaultdict(int)
    for name, ms in op_events(trace_dir):
        key = re.sub(r"\.\d+", "", name.split(" = ")[0])
        stats[key] += ms
        counts[key] += 1

    total = sum(stats.values())
    print(f"total device time: {total:.1f} ms ({total / n_steps:.2f} ms/step)")
    fams = collections.defaultdict(float)
    for key, ms in stats.items():
        fams[family_of(key)] += ms
    print("--- families ---")
    for fam, ms in sorted(fams.items(), key=lambda kv: -kv[1]):
        print(f"{ms / n_steps:8.3f} ms/step  {fam}")
    print("--- top ops ---")
    for key, ms in sorted(stats.items(), key=lambda kv: -kv[1])[:60]:
        print(f"{ms / n_steps:8.3f} ms/step x{counts[key] // n_steps:<4d} {key[:120]}")


if __name__ == "__main__":
    main()
