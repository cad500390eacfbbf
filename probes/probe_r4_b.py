import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import dataclasses
import numpy as np
from gmpnp_tpu.models import pore_3d
from gmpnp_tpu.solve.timeloop import NewtonConfig

for volt, ts in ((-2.5, 32e-3), (-2.5, 64e-3), (-5.0, 8e-3), (-5.0, 16e-3)):
    cfg = pore_3d.Pore3DConfig(
        physics="GMPNP", mesh_resolution=(2, 8), voltage_multiplier=volt,
        time_step=ts,
        newton=NewtonConfig(max_iter=12, rtol=1e-6, atol=1e-6, relaxation=0.9))
    cfg = dataclasses.replace(cfg, dt_retries=4)
    try:
        u0, h, stats, uf = pore_3d._run_sharded(
            pore_3d.build(cfg), cfg, shard=2, n_steps=2, record_stride=1)
        print(f"V={volt} ts={ts}: conv={np.asarray(stats.converged)} "
              f"scale={np.asarray(stats.dt_scale)}", flush=True)
    except Exception as e:
        print(f"V={volt} ts={ts}: {type(e).__name__} {e}", flush=True)

# Results (round 4): sharded 2-device transient, (2,8) mesh, max_iter=12:
#   V=-2.5 ts=0.032: conv=[T T] scale=[1.   1.]
#   V=-2.5 ts=0.064: conv=[T T] scale=[0.5  1.]   <- the recovery shape
#   V=-5.0 ts=0.008: conv=[F F] scale=[0.0625 0.0625]
#   V=-5.0 ts=0.016: conv=[F F] scale=[0.0625 0.0625]
# V=-2.5 at 64x reference dt fails the cold start at full dt and converges
# after ONE halving -> tests/test_parallel.py::test_sharded_transient_dt_cut_recovery.
