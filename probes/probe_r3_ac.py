"""Round-3 probe: facet-Jacobian TPU fault — jacfwd values or scatter?

probe_r3_ab isolated the rxn_diff TPU Jacobian error to the facet
contribution (0.17 max-abs garbage vs a true facet scale of 2.1e-7;
volume path matches CPU to 3.5e-12).  The facet path is two stages:

  Jf = vmap(jacfwd(local facet residual))        # per-facet values
  flat.at[frows, fcols].add(Jf)                  # 2D scatter-add

This probe runs each stage separately per backend and diffs hostside:
  1. Jf values per marker (TPU vs CPU)
  2. a zeros.at[frows, fcols].add(Jf_cpu) scatter of identical values
     (TPU vs numpy accumulation)

Run: python probes/probe_r3_ac.py driver
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")

OUT = "/tmp/probe_r3_ac.json"
NPZ = "/tmp/probe_r3_ac_cpu.npz"


def stages(backend: str):
    import jax

    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from gmpnp_tpu.models import pore_3d

    cfg = pore_3d.Pore3DConfig(physics="rxn_diff", L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg)
    space, form = prog.space, prog.form
    N, nf = space.num_vertices, cfg.n_fields
    print(f"dev {jax.devices()[0]} N={N} nf={nf}", flush=True)

    u0 = jnp.ones((N, nf))
    th = prog._theta_of_carry((u0, jnp.asarray(0.0)), jnp.asarray(0))
    bc = prog._bc_of_theta(th)
    u = bc.project(u0)

    out = {"backend": backend}
    K = space.adj.shape[1]
    jf_by_marker = {}
    scat_by_marker = {}
    for marker, tab in space.facet_tabs:
        fn = form.boundary.get(marker)
        if fn is None:
            continue

        def local_fjac(uf, mf, xf):
            f_res = lambda uu: space._local_facet_residual(
                fn, uu, mf, tab["shape"], tab["weights"], xf, th)
            J = jax.jacfwd(f_res)(uf)
            return jnp.transpose(J, (0, 2, 1, 3)).reshape(-1)

        Jf = jax.jit(lambda uu: jax.vmap(local_fjac)(
            uu[tab["nodes"]], jnp.asarray(tab["meas"]),
            jnp.asarray(tab["xq"])))(u)
        jf_by_marker[marker] = np.asarray(Jf)

        frows, fcols = space._scatter_tables(tab["nodes"], tab["slot"])
        if backend == "cpu":
            vals = np.asarray(Jf)
        else:
            vals = np.load(NPZ)[f"jf{marker}"]
        scat = jax.jit(
            lambda v: jnp.zeros((N, nf * K * nf))
            .at[frows, fcols].add(v))(jnp.asarray(vals))
        scat_by_marker[marker] = np.asarray(scat)
        # numpy ground truth of the same scatter
        gt = np.zeros((N, nf * K * nf))
        np.add.at(gt, (frows.reshape(-1), fcols.reshape(-1)),
                  vals.reshape(-1))
        d = float(np.abs(scat_by_marker[marker] - gt).max())
        out[f"scatter_vs_numpy_m{marker}"] = d
        print(f"  marker {marker}: scatter vs numpy add.at: {d:.3e}",
              flush=True)

    if backend == "cpu":
        np.savez(NPZ, **{f"jf{m}": v for m, v in jf_by_marker.items()},
                 **{f"scat{m}": v for m, v in scat_by_marker.items()})
    else:
        ref = np.load(NPZ)
        for m, v in jf_by_marker.items():
            d = float(np.abs(v - ref[f"jf{m}"]).max())
            s = float(np.abs(ref[f"jf{m}"]).max())
            out[f"jf_maxdiff_m{m}"] = d
            out[f"jf_scale_m{m}"] = s
            print(f"  marker {m}: Jf maxdiff vs CPU {d:.3e} "
                  f"(scale {s:.3e})", flush=True)
    print("RESULT " + json.dumps(out), flush=True)


def driver():
    here = os.path.abspath(__file__)
    results = {}
    for backend in ("cpu", "tpu"):
        print(f"[ac] === {backend} ===", flush=True)
        try:
            p = subprocess.run([sys.executable, here, backend],
                               capture_output=True, text=True, timeout=3000)
            outp = p.stdout + p.stderr
            got = None
            for line in outp.splitlines():
                if line.startswith("RESULT "):
                    got = json.loads(line[len("RESULT "):])
                elif line.startswith("  "):
                    print("   " + line, flush=True)
            if got is None:
                tail = "\n".join(outp.splitlines()[-8:])
                got = {"error": f"rc={p.returncode}", "tail": tail[-600:]}
            results[backend] = got
        except subprocess.TimeoutExpired:
            results[backend] = {"error": "timeout"}
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("[ac] done", flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "driver":
        driver()
    else:
        stages(sys.argv[1])
