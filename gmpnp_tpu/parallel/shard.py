"""Z-slab domain decomposition of the 3D pore solve over a device mesh.

The TPU-native replacement for the MPI/METIS distributed-memory path latent
in the reference stack (environment.yml:73-75; never exercised by the
scripts): the cylinder is slab-partitioned along z across devices inside a
``jax.sharding.Mesh``; every assembly/matvec does one ``ppermute`` halo
gather and one ``ppermute`` spill reduction over ICI; Krylov/Newton
reductions are ``psum``.  The entire Newton step runs inside a single
``shard_map``-wrapped jit.

Partitioning scheme (host-side, ZShardPlan.build):
- vertices sorted by z and split into equal contiguous blocks of N_p
  (zero-padded to n_dev * N_p);
- an element is owned by the device owning its minimum vertex; since slabs
  are contiguous in z, every element's vertices then live in
  [own block, own block + H) where H is the (exact, precomputed) maximum
  overshoot — the right halo width;
- boundary facets follow the same ownership rule.

SPMD step primitives:
- halo_gather:  u_ext = [u_own ; first H rows of right neighbor]
- spill_reduce: fold contributions accumulated for halo rows back onto
  their owner (left-shift ppermute + add)
- Dirichlet row masking happens post-reduction on the owner, which is
  exactly equivalent to the single-device row replacement.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gmpnp_tpu.fem.elements import physical_gradients, simplex_quadrature
from gmpnp_tpu.fem.forms import WeakForm
from gmpnp_tpu.solve.smallblock import block_inv
from gmpnp_tpu.mesh.core import (
    Mesh as FemMesh,
    cell_measures,
    facet_measures,
)


@dataclass(frozen=True)
class ZShardPlan:
    """Host-side partition tables.  All per-device arrays carry a leading
    n_dev axis and are fed to shard_map with in_specs P('z')."""

    n_dev: int
    n_fields: int
    N: int              # true vertex count
    N_p: int            # owned vertices per device (padded)
    H: int              # right-halo width
    # per-device element tables, shape (n_dev, C_p, ...)
    cells_l: np.ndarray     # extended-local vertex ids, (n_dev, C_p, nv)
    vols: np.ndarray        # (n_dev, C_p); padding elements have vol 0
    gradN: np.ndarray       # (n_dev, C_p, nv, dim)
    # quadrature (shared)
    Nq: np.ndarray
    wq: np.ndarray
    # per-device boundary facet tables per marker:
    # dict marker -> (nodes_l (n_dev, F_p, fnv), meas (n_dev, F_p), shape, w)
    facets: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]
    # Dirichlet data over owned nodes, (n_dev, N_p, f)
    bc_mask: np.ndarray
    bc_vals: np.ndarray
    # owned-node validity (padding rows false), (n_dev, N_p)
    valid: np.ndarray

    @staticmethod
    def build(mesh: FemMesh, n_fields: int, n_dev: int,
              bc_mask: np.ndarray, bc_vals: np.ndarray,
              quad_degree: int = 2):
        """mesh must already be sorted ascending in its last coordinate
        (use reorder_by_coordinate); bc_mask/vals are global (N, f)."""
        dim = mesh.dim
        nv = dim + 1
        N = mesh.num_vertices
        N_p = -(-N // n_dev)
        N_pad = N_p * n_dev

        cells = mesh.cells.astype(np.int64)
        owner = cells.min(axis=1) // N_p
        block_end = (owner + 1) * N_p
        overshoot = cells.max(axis=1) - (block_end - 1)
        H = max(1, int(np.maximum(overshoot, 0).max()))
        if H > N_p:
            raise ValueError(
                f"halo width {H} exceeds slab size {N_p}: too many devices "
                f"for this mesh ({N} vertices, {n_dev} devices)")

        vols_g = cell_measures(mesh.points, mesh.cells)
        gradN_g = physical_gradients(mesh.points, mesh.cells)
        rule = simplex_quadrature(dim, quad_degree)

        C_p = max(int((owner == p).sum()) for p in range(n_dev))
        cells_l = np.zeros((n_dev, C_p, nv), dtype=np.int32)
        vols = np.zeros((n_dev, C_p))
        gradN = np.zeros((n_dev, C_p, nv, dim))
        for p in range(n_dev):
            sel = np.nonzero(owner == p)[0]
            k = len(sel)
            cells_l[p, :k] = cells[sel] - p * N_p
            vols[p, :k] = vols_g[sel]
            gradN[p, :k] = gradN_g[sel]

        # boundary facets by the same ownership rule
        facets = {}
        if mesh.facets is not None and len(mesh.facets):
            fdim = dim - 1
            if fdim == 0:
                fshape = np.ones((1, 1))
                fw = np.ones(1)
            else:
                frule = simplex_quadrature(fdim, quad_degree)
                fshape, fw = frule.shape, frule.weights
            for m in np.unique(mesh.facet_markers):
                fsel = mesh.facets[mesh.facet_markers == m].astype(np.int64)
                fmeas_g = facet_measures(mesh.points, fsel)
                fowner = fsel.min(axis=1) // N_p
                over = fsel.max(axis=1) - ((fowner + 1) * N_p - 1)
                assert int(np.maximum(over, 0).max(initial=0)) <= H
                F_p = max(1, max(int((fowner == p).sum())
                                 for p in range(n_dev)))
                fn = np.zeros((n_dev, F_p, fsel.shape[1]), dtype=np.int32)
                fm = np.zeros((n_dev, F_p))
                for p in range(n_dev):
                    s = np.nonzero(fowner == p)[0]
                    fn[p, :len(s)] = fsel[s] - p * N_p
                    fm[p, :len(s)] = fmeas_g[s]
                facets[int(m)] = (fn, fm, fshape, fw)

        def pad_nodes(arr, fill=0.0):
            out = np.full((N_pad,) + arr.shape[1:], fill, dtype=arr.dtype)
            out[:N] = arr
            return out.reshape((n_dev, N_p) + arr.shape[1:])

        valid = pad_nodes(np.ones(N, dtype=bool), False)
        return ZShardPlan(
            n_dev=n_dev, n_fields=n_fields, N=N, N_p=N_p, H=H,
            cells_l=cells_l, vols=vols, gradN=gradN,
            Nq=rule.shape, wq=rule.weights,
            facets=facets,
            bc_mask=pad_nodes(bc_mask.astype(bool), False),
            bc_vals=pad_nodes(bc_vals.astype(np.float64)),
            valid=valid,
        )


def make_sharded_transient(
    plan: ZShardPlan,
    form: WeakForm,
    mesh_devices,
    newton_max_iter: int = 50,
    newton_rtol: float = 1.0e-4,
    newton_atol: float = 1.0e-4,
    relaxation: float = 0.9,
    krylov_tol: float = 1.0e-6,
    krylov_maxiter: int = 2000,
    axis_name: str = "z",
):
    """Build a jit-compiled sharded transient step.

    Returns (step_fn, device_mesh, u_sharding) with
    ``step_fn(u_sharded (n_dev*N_p, f), theta) -> (u_new, stats)`` running
    Newton + block-Jacobi BiCGStab fully inside shard_map.
    """
    n_dev, N_p, H, nf = plan.n_dev, plan.N_p, plan.H, plan.n_fields
    dev_mesh = Mesh(np.array(mesh_devices).reshape(n_dev), (axis_name,))
    u_sharding = NamedSharding(dev_mesh, P(axis_name))

    fwd_perm = [(p, p - 1) for p in range(1, n_dev)]   # halo gather (recv
                                                       # right nbr's head)
    bwd_perm = [(p, p + 1) for p in range(n_dev - 1)]  # spill reduce

    def halo_gather(u_loc):
        recv = jax.lax.ppermute(u_loc[:H], axis_name, fwd_perm)
        return jnp.concatenate([u_loc, recv], axis=0)

    def spill_reduce(r_ext):
        own, spill = r_ext[:N_p], r_ext[N_p:]
        recv = jax.lax.ppermute(spill, axis_name, bwd_perm)
        return own.at[:H].add(recv)

    def pdot(a, b):
        return jax.lax.psum(jnp.sum(a * b), axis_name)

    def pnorm(a):
        return jnp.sqrt(pdot(a, a))

    Nq = jnp.asarray(plan.Nq)
    wq = jnp.asarray(plan.wq)

    def local_residual_ext(u_ext, up_ext, theta, cells, vols, gradN,
                           facets):
        """Element + facet assembly into the extended index space."""
        u_e = u_ext[cells]
        up_e = up_ext[cells]

        def elem(ue, upe, g, v):
            grad_u = jnp.einsum("af,ad->fd", ue, g)

            def at_q(Nq_q):
                u_q = Nq_q @ ue
                up_q = Nq_q @ upe
                fval, fgrad = form.volume(u_q, grad_u, up_q, None, theta)
                return (jnp.outer(Nq_q, fval)
                        + jnp.einsum("ad,fd->af", g, fgrad))

            contrib = jax.vmap(at_q)(Nq)
            return v * jnp.einsum("q,qaf->af", wq, contrib)

        r_e = jax.vmap(elem)(u_e, up_e, gradN, vols)
        r_ext = jnp.zeros((N_p + H, nf), u_ext.dtype)
        r_ext = r_ext.at[cells].add(r_e)

        for m, (fn_nodes, fmeas, fshape, fw) in facets.items():
            bfn = form.boundary.get(m)
            if bfn is None:
                continue
            fshape_j = np.asarray(fshape)
            fw_j = np.asarray(fw)
            u_f = u_ext[fn_nodes]

            def facet(uf, meas):
                def at_q(Nq_q):
                    g = bfn(Nq_q @ uf, None, theta)
                    return jnp.outer(Nq_q, g)
                contrib = jax.vmap(at_q)(fshape_j)
                return meas * jnp.einsum("q,qaf->af", fw_j, contrib)

            rf = jax.vmap(facet)(u_f, fmeas)
            r_ext = r_ext.at[fn_nodes].add(rf)
        return r_ext

    def local_jacobian(u_ext, up_ext, theta, cells, vols, gradN, facets):
        """Per-element Jacobian blocks in the extended space (not reduced:
        the matvec spills instead)."""
        def elem_jac(ue, upe, g, v):
            def local(uu):
                grad_u = jnp.einsum("af,ad->fd", uu, g)

                def at_q(Nq_q):
                    u_q = Nq_q @ uu
                    up_q = Nq_q @ upe
                    fval, fgrad = form.volume(u_q, grad_u, up_q, None, theta)
                    return (jnp.outer(Nq_q, fval)
                            + jnp.einsum("ad,fd->af", g, fgrad))

                contrib = jax.vmap(at_q)(Nq)
                return v * jnp.einsum("q,qaf->af", wq, contrib)

            J = jax.jacfwd(local)(ue)       # (nv, f, nv, f)
            return jnp.transpose(J, (0, 2, 1, 3))

        J_e = jax.vmap(elem_jac)(u_ext[cells], up_ext[cells], gradN, vols)

        J_f = {}
        for m, (fn_nodes, fmeas, fshape, fw) in facets.items():
            bfn = form.boundary.get(m)
            if bfn is None:
                continue
            fshape_j = np.asarray(fshape)
            fw_j = np.asarray(fw)

            def facet_jac(uf, meas):
                def local(uu):
                    def at_q(Nq_q):
                        g = bfn(Nq_q @ uu, None, theta)
                        return jnp.outer(Nq_q, g)
                    contrib = jax.vmap(at_q)(fshape_j)
                    return meas * jnp.einsum("q,qaf->af", fw_j, contrib)

                J = jax.jacfwd(local)(uf)
                return jnp.transpose(J, (0, 2, 1, 3))

            J_f[m] = jax.vmap(facet_jac)(u_ext[fn_nodes], fmeas)
        return J_e, J_f

    def make_matvec(J_e, J_f, cells, facets, ident_rows):
        """Distributed matvec with identity action on masked rows
        (Dirichlet + padding), equivalent to single-device row
        replacement."""
        def matvec(x_loc):
            x_ext = halo_gather(x_loc)
            x_e = x_ext[cells]                       # (C, nv, f)
            y_e = jnp.einsum("cabfg,cbg->caf", J_e, x_e)
            y_ext = jnp.zeros((N_p + H, nf), x_loc.dtype)
            y_ext = y_ext.at[cells].add(y_e)
            for m, Jf in J_f.items():
                fn_nodes = facets[m][0]
                x_f = x_ext[fn_nodes]
                y_f = jnp.einsum("cabfg,cbg->caf", Jf, x_f)
                y_ext = y_ext.at[fn_nodes].add(y_f)
            y = spill_reduce(y_ext)
            return jnp.where(ident_rows, x_loc, y)
        return matvec

    def diag_blocks_reduced(J_e, J_f, cells, facets, ident_rows):
        """Exact owned diagonal blocks (spill-reduced) for block-Jacobi."""
        nv = cells.shape[1]
        D_ext = jnp.zeros((N_p + H, nf, nf))
        for a in range(nv):
            D_ext = D_ext.at[cells[:, a]].add(J_e[:, a, a])
        for m, Jf in J_f.items():
            fn_nodes = facets[m][0]
            for a in range(fn_nodes.shape[1]):
                D_ext = D_ext.at[fn_nodes[:, a]].add(Jf[:, a, a])
        own, spill = D_ext[:N_p], D_ext[N_p:]
        recv = jax.lax.ppermute(spill, axis_name, bwd_perm)
        D = own.at[:H].add(recv)
        eye = jnp.eye(nf)
        D = jnp.where(ident_rows[:, :, None] & (eye[None] > 0), 1.0, D)
        D = jnp.where(ident_rows[:, :, None] & (eye[None] == 0), 0.0, D)
        return block_inv(D)

    def bicgstab_sharded(matvec, Minv, b):
        # guards sized for TPU-emulated f64 (f32 exponent range): 1e-300
        # would underflow to 0 and produce NaN storms
        TINY = 1e-30
        guard = lambda x: jnp.where(jnp.abs(x) < TINY, TINY, x)
        x = jnp.zeros_like(b)
        r = b - matvec(x)
        rhat = r
        target = jnp.maximum(krylov_tol * pnorm(b), TINY)

        def cond(st):
            x, r, p_, v, rho, alpha, omega, it = st
            rn = pnorm(r)
            healthy = (jnp.isfinite(rn) & jnp.isfinite(rho)
                       & jnp.isfinite(omega)
                       & (jnp.abs(rho) > TINY) & (jnp.abs(omega) > TINY)
                       & (rn < 1e12))   # emulated-f64 overflow horizon
            return (rn > target) & (it < krylov_maxiter) & healthy

        def body(st):
            x, r, p_, v, rho, alpha, omega, it = st
            rho_new = pdot(rhat, r)
            beta = (rho_new / guard(rho)) * (alpha / guard(omega))
            p_ = r + beta * (p_ - omega * v)
            phat = jnp.einsum("nfg,ng->nf", Minv, p_)
            v = matvec(phat)
            alpha = rho_new / guard(pdot(rhat, v))
            s = r - alpha * v
            shat = jnp.einsum("nfg,ng->nf", Minv, s)
            t = matvec(shat)
            omega = pdot(t, s) / guard(pdot(t, t))
            x = x + alpha * phat + omega * shat
            r = s - omega * t
            return (x, r, p_, v, rho_new, alpha, omega, it + 1)

        zeros = jnp.zeros_like(b)
        one = jnp.asarray(1.0, b.dtype)
        st = jax.lax.while_loop(
            cond, body,
            (x, r, zeros, zeros, one, one, one, jnp.array(0, jnp.int32)))
        return st[0], st[-1]

    def step_local(u_loc, up_loc, theta, cells, vols, gradN, bc_mask,
                   bc_vals, valid, *facet_flat):
        # rebuild the facets dict from flattened per-marker arrays
        facets = {}
        it = iter(facet_flat)
        for m, (_, _, fshape, fw) in sorted(plan.facets.items()):
            fn = next(it)
            fm = next(it)
            facets[m] = (fn, fm, fshape, fw)

        ident_rows = bc_mask | (~valid)[:, None]

        def residual(u_loc):
            u_ext = halo_gather(u_loc)
            up_ext = halo_gather(up_loc)
            r = spill_reduce(local_residual_ext(
                u_ext, up_ext, theta, cells, vols, gradN, facets))
            r = jnp.where(bc_mask, u_loc - bc_vals, r)
            return jnp.where(valid[:, None], r, 0.0)

        u0 = jnp.where(bc_mask, bc_vals, u_loc)
        r0 = residual(u0)
        n0 = pnorm(r0)

        def converged(rn):
            return (rn < newton_atol) | (rn < newton_rtol * n0)

        def cond(st):
            u, r, rn, it, lin = st
            return (~converged(rn)) & (it < newton_max_iter)

        def body(st):
            u, r, rn, it, lin = st
            u_ext = halo_gather(u)
            up_ext = halo_gather(up_loc)
            J_e, J_f = local_jacobian(
                u_ext, up_ext, theta, cells, vols, gradN, facets)
            mv = make_matvec(J_e, J_f, cells, facets, ident_rows)
            Minv = diag_blocks_reduced(J_e, J_f, cells, facets, ident_rows)
            du, klin = bicgstab_sharded(mv, Minv, r)
            u = u - relaxation * du
            r = residual(u)
            return (u, r, pnorm(r), it + 1, lin + klin)

        u, r, rn, iters, lin = jax.lax.while_loop(
            cond, body,
            (u0, r0, n0, jnp.array(0, jnp.int32), jnp.array(0, jnp.int32)))
        return u, (iters, converged(rn), rn, lin)

    import inspect
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    _smkw = {}
    sig_params = inspect.signature(shard_map).parameters
    if "check_rep" in sig_params:
        _smkw["check_rep"] = False
    elif "check_vma" in sig_params:
        _smkw["check_vma"] = False

    facet_flat = []
    facet_specs = []
    for m, (fn, fm, fshape, fw) in sorted(plan.facets.items()):
        facet_flat += [np.asarray(fn), np.asarray(fm)]
        facet_specs += [P(axis_name), P(axis_name)]

    sharded = shard_map(
        step_local,
        mesh=dev_mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P(axis_name),
                  P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), *facet_specs),
        out_specs=(P(axis_name), (P(), P(), P(), P())),
        **_smkw,
    )

    cells_flat = np.asarray(plan.cells_l).reshape(n_dev * plan.cells_l.shape[1], -1)
    vols_flat = np.asarray(plan.vols).reshape(-1)
    gradN_flat = np.asarray(plan.gradN).reshape(
        (n_dev * plan.gradN.shape[1],) + plan.gradN.shape[2:])
    bc_mask_flat = np.asarray(plan.bc_mask).reshape(n_dev * N_p, nf)
    bc_vals_flat = np.asarray(plan.bc_vals).reshape(n_dev * N_p, nf)
    valid_flat = np.asarray(plan.valid).reshape(n_dev * N_p)
    facet_flat = [a.reshape((-1,) + tuple(a.shape[2:])) for a in facet_flat]

    @jax.jit
    def step(u_shard, up_shard, theta):
        return sharded(u_shard, up_shard, theta, cells_flat, vols_flat,
                       gradN_flat, bc_mask_flat, bc_vals_flat, valid_flat,
                       *facet_flat)

    return step, dev_mesh, u_sharding
