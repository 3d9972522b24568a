"""Attribute a train-step trace to op families via HLO metadata.

Joins the xplane 'XLA Ops' durations (scripts/analyze_trace.py) with
the optimized HLO's per-instruction ``metadata={op_name=...}`` to roll
step time up into semantic families (conv fwd/bwd per branch, UNets,
PathNet kernels, kernel-apply, FMSE, optimizer, glue copies).  This is
the measurement behind the per-op budget table in PERF_BUDGET.json and
the regression guardrail (scripts/check_perf_budget.py).

Usage:
    python scripts/profile_step.py /tmp/trace_dir      # capture
    python scripts/profile_families.py /tmp/trace_dir /tmp/step_hlo.txt
"""
import collections
import re
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyze_trace import op_events

_META = re.compile(
    r"%([\w.\-]+) = .*?metadata=\{op_name=\"([^\"]*)\""
    r"(?:[^}]*?source_file=\"([^\"]*)\")?"
)


def hlo_metadata(hlo_path):
    """instruction name -> (op_name, source_file)."""
    meta = {}
    with open(hlo_path) as f:
        for line in f:
            m = _META.search(line)
            if m:
                meta[m.group(1)] = (m.group(2), m.group(3) or "")
    return meta


def classify(inst, op_name, source):
    """Map one instruction to a budget family."""
    if "pathnet" in source or "mlp_fused" in source or inst.startswith(
        ("jvp__", "transpose_jvp__")
    ):
        return "pathnet_bwd" if "transpose" in inst or "transpose" in op_name \
            else "pathnet_fwd"
    if "pallas_kernels" in source or "kernel_apply" in source or inst.startswith(
        ("gather_tpu", "outer_softmax", "scatter")
    ):
        return "kernel_apply"
    if "losses.py" in source or "feature_mse" in op_name or "manif" in op_name:
        return "fmse"
    if "optax" in source or "optax" in op_name:
        return "optimizer"
    if re.search(r"transpose\(jvp\(KPCN\)\).*Conv", op_name):
        return "kpcn_conv_bwd"
    if re.search(r"jvp\(KPCN\).*Conv", op_name):
        return "kpcn_conv_fwd"
    # primal-only graphs (val/inference) carry no jvp prefix
    if "KPCN" in op_name and ("Conv_" in op_name or "conv" in op_name):
        return "kpcn_conv_fwd"
    if ("UNet" in op_name or "dual_unet" in op_name
            or "blocks.py" in source):
        return "unet"
    if "KPCN" in op_name:
        return "kpcn_glue"
    return "other"


def family_times(trace_dir, hlo_path, n_steps=3, detail=None):
    meta = hlo_metadata(hlo_path)
    fams = collections.defaultdict(float)
    unattributed = collections.defaultdict(float)
    detail_insts = collections.defaultdict(float)
    for name, ms in op_events(trace_dir):
        inst = name.split(" = ")[0].lstrip("%")
        op_name, source = meta.get(inst, ("", ""))
        fam = classify(inst, op_name, source)
        fams[fam] += ms / n_steps
        if fam == "other" and not op_name:
            unattributed[inst.split(".")[0]] += ms / n_steps
        if fam == detail:
            # bucket by HLO opcode prefix (fusion kind survives in the
            # instruction name: %fusion / %convolution / %copy ...)
            detail_insts[(inst.split(".")[0], op_name[:70])] += ms / n_steps
    return dict(fams), dict(unattributed), dict(detail_insts)


def main():
    args = sys.argv[1:]
    detail = None
    if "--detail" in args:
        i = args.index("--detail")
        detail = args[i + 1]
        del args[i:i + 2]
    argv = [a for a in args if not a.startswith("--")]
    trace_dir = argv[0] if len(argv) > 0 else "/tmp/jax_trace_step"
    hlo_path = argv[1] if len(argv) > 1 else "/tmp/step_hlo.txt"
    fams, unattributed, detail_insts = family_times(
        trace_dir, hlo_path, detail=detail
    )
    total = sum(fams.values())
    print(f"total attributed device time: {total:.2f} ms/step")
    for fam, ms in sorted(fams.items(), key=lambda kv: -kv[1]):
        print(f"  {ms:7.3f} ms/step  {fam}")
    big = {k: v for k, v in unattributed.items() if v > 0.05}
    if big:
        print("largest unattributed (no HLO metadata):")
        for k, v in sorted(big.items(), key=lambda kv: -kv[1])[:10]:
            print(f"  {v:7.3f} ms/step  {k}")
    if detail_insts:
        print(f"top instructions inside '{detail}':")
        for (inst, op), v in sorted(
            detail_insts.items(), key=lambda kv: -kv[1]
        )[:20]:
            print(f"  {v:7.3f} ms/step  {inst:<16} {op}")


if __name__ == "__main__":
    main()
