"""Profile the chained (device-resident) flagship train step and print a
per-category time breakdown."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob
import re
import numpy as np, jax, jax.numpy as jnp
from wcmc_tpu.data.batches import synthetic_batch
from wcmc_tpu.train.factory import TrainConfig, init_interfaces

N = 10


def main():
    trace_dir = f"/tmp/trace_chained_{int(time.time())}"
    cfg = TrainConfig(base_model="kpcn", use_llpm_buf=True, manif_learn=True,
                      manif_loss="FMSE", finite_check_every=10**9)
    iface = init_interfaces(cfg)[0]
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, "kpcn", batch_size=8, patch=128, spp=8,
                            use_llpm_buf=True)
    raw_step = iface._make_train_step()
    key = jax.random.PRNGKey(0)

    @jax.jit
    def chained(states, n):
        def body(i, s):
            ns, _ = raw_step(s, batch, jax.random.fold_in(key, i))
            return ns
        return jax.lax.fori_loop(0, n, body, states)

    def rb(s):
        return float(jnp.sum(jax.tree_util.tree_leaves(s["dncnn"].params)[0]))

    rb(chained(iface.states, 2))
    jax.profiler.start_trace(trace_dir)
    rb(chained(iface.states, N))
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    f = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.xplane.pb"))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(f, "rb").read())

    def categorize(name):
        if "custom-call" in name or "tpu_custom_call" in name or "pallas" in name.lower():
            return "pallas"
        if name.startswith("%convolution") or ".convolution" in name:
            return "convolution"
        if name.startswith("%copy-start") or name.startswith("%copy-done"):
            return "async copy"
        if name.startswith("%slice-start") or name.startswith("%slice-done"):
            return "async slice"
        if name.startswith("%fusion") or "_fusion" in name:
            return "fusion (elementwise/reduce)"
        if name.startswith("%while") or "jit_" in name or name.isdigit():
            return "(program)"
        return "other"

    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        print(f"== plane {plane.name}: {len(plane.lines)} lines")
        for line in plane.lines:
            total = sum(ev.duration_ps for ev in line.events) / 1e9 / N
            if total < 0.5:
                continue
            cats = {}
            tops = {}
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                c = categorize(name)
                cats[c] = cats.get(c, 0) + ev.duration_ps / 1e9
                tops[name] = tops.get(name, 0) + ev.duration_ps / 1e9
            print(f"-- line '{line.name}' total {total:.1f} ms/step")
            for c, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
                print(f"   {ms/N:8.2f} ms/step  {c}")
            for name, ms in sorted(tops.items(), key=lambda kv: -kv[1])[:8]:
                print(f"      top: {ms/N:7.2f} ms  {name[:95]}")
        break


if __name__ == "__main__":
    main()
