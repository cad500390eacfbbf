"""Headline benchmark: 3D GMPNP pore implicit-step throughput.

Measures the flagship workload — one backward-Euler implicit step (damped
Newton over the coupled 9-field GMPNP system, BiCGStab + multicolor block
SSOR inner solves, Sechenov BC update) on the config-5 geometry — on the
default JAX device (TPU under the driver), and compares against the same
compiled program on a single host CPU core, which is the BASELINE.json
comparison axis ("target >= 10x single-CPU-core wall-clock").

Prints ONE JSON line:
    {"metric": ..., "value": ms/step on accelerator, "unit": "ms",
     "vs_baseline": cpu_ms / accel_ms}
"""

import json
import os
import sys
import time


def _build(n_rings=3, n_layers=40):
    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.timeloop import make_implicit_step
    import jax.numpy as jnp

    cfg = pore_3d.Pore3DConfig(
        physics="GMPNP", L=100e-9, R=10e-9,
        mesh_resolution=(n_rings, n_layers))
    prog = pore_3d.build(cfg)
    nf = cfg.n_fields
    ns = len(cfg.species)
    step = make_implicit_step(
        prog.space, prog.form, cfg.newton, cfg.linear,
        bc_of_theta=prog._bc_of_theta)

    import jax

    @jax.jit
    def do_step(u, theta):
        u_new, stats = step(u, theta)
        return u_new, stats.newton_iters

    u0 = jnp.ones((prog.space.num_vertices, nf)).at[:, ns].set(0.0)
    theta = {
        "dt": jnp.asarray(prog.dt_scaled),
        "co2_s1": jnp.asarray(prog.eq_conc["CO2"] / prog.bulk_conc["CO2"]),
    }
    return do_step, u0, theta, prog


def _time_steps(do_step, u0, theta, device, n_warm, n_time):
    import jax

    u = jax.device_put(u0, device)
    th = {k: jax.device_put(v, device) for k, v in theta.items()}
    for _ in range(n_warm):
        u, _ = do_step(u, th)
    u.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n_time):
        u, _ = do_step(u, th)
    u.block_until_ready()
    return (time.perf_counter() - t0) / n_time


def main():
    import jax

    do_step, u0, theta, prog = _build()
    accel = jax.devices()[0]
    accel_s = _time_steps(do_step, u0, theta, accel, n_warm=3, n_time=10)

    vs_baseline = None
    try:
        cpu = jax.devices("cpu")[0]
        if cpu.platform == accel.platform:
            # already running on CPU: ratio is 1 by construction
            vs_baseline = 1.0
        else:
            cpu_s = _time_steps(do_step, u0, theta, cpu, n_warm=1, n_time=2)
            vs_baseline = cpu_s / accel_s
    except Exception:
        vs_baseline = None

    print(json.dumps({
        "metric": "pore3d_gmpnp_implicit_step",
        "value": round(accel_s * 1e3, 3),
        "unit": "ms/step",
        "vs_baseline": (round(vs_baseline, 3)
                        if vs_baseline is not None else None),
    }))


if __name__ == "__main__":
    main()
