"""Capture and summarize a TPU profile of the flagship train step."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob
import numpy as np
import jax
import jax.numpy as jnp

from wcmc_tpu.data.batches import synthetic_batch
from wcmc_tpu.train.factory import TrainConfig, init_interfaces


def main():
    cfg = TrainConfig(base_model="kpcn", use_llpm_buf=True, manif_learn=True,
                      manif_loss="FMSE", finite_check_every=10**9)
    iface = init_interfaces(cfg)[0]
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, "kpcn", batch_size=8, patch=128, spp=8,
                            use_llpm_buf=True)
    iface.to_train_mode()
    for _ in range(3):
        iface.preprocess(batch)
        ld = iface.train_batch(batch)
    float(sum(jnp.sum(v) for v in ld.values()))

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_step"
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        iface.preprocess(batch)
        ld = iface.train_batch(batch)
    float(sum(jnp.sum(v) for v in ld.values()))
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    f = glob.glob(trace_dir + "/plugins/profile/*/*.xplane.pb")[0]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(f, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        stats = {}
        for line in plane.lines:
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                stats[name] = stats.get(name, 0) + ev.duration_ps / 1e9
        for name, ms in sorted(stats.items(), key=lambda kv: -kv[1])[:25]:
            print(f"{ms/3:8.3f} ms/step  {name[:110]}", flush=True)
        break


if __name__ == "__main__":
    main()
