"""Flux-recovery error estimation for H(curl) fields.

Curl-flux (ZZ-style) estimator: the discontinuous magnetic flux
F = mu^-1 curl E is L2-projected onto a smooth space (the ND space in 3D,
scalar H1 in 2D where curl is out-of-plane); the per-element energy-norm
mismatch

    eta_K^2 = int_K (curl E - mu F_hat)^T mu^-1 (curl E - mu F_hat)

estimates the local discretization error (reference:
palace/linalg/errorestimator.cpp CurlFluxErrorEstimator, which measures
|sqrt(mu^-1) B - sqrt(mu) H_smooth|^2 with an RT-space B; here B = curl of
the ND solution directly, avoiding the RT space as everywhere in this
framework).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from palace_tpu.fem.nd import NDSpace
from palace_tpu.fem.nd_operators import nd_operator
from palace_tpu.fem.operators import default_qorder
from palace_tpu.linalg.iterative import cg
from palace_tpu.linalg.smoothers import jacobi
from palace_tpu.mesh import geometry as geom_mod


def _solver(op):
    """Mass solve for the flux recovery.  Jacobi-CG first (device path);
    high order + curved elements can stall it (p = 4 needs ~500 its even on
    a uniform box), so fall back to an assembled sparse-direct solve — an
    unconverged recovery silently inflates every indicator (this was the
    15-20x error-indicators.csv mismatch on the p = 4 cylinder cases)."""
    prec = jacobi(op.diagonal())
    state = {}

    def solve(v):
        if "lu" not in state:
            res = cg(op, jnp.asarray(v), M=prec, tol=1e-10, max_its=1500)
            if bool(res.converged):
                return np.asarray(res.x)
            from scipy.sparse.linalg import splu

            # Once CG has stalled it will stall for every RHS of this
            # operator — factor once and stay direct.
            state["lu"] = splu(op.assemble_csr().tocsc())
        return state["lu"].solve(np.asarray(v))

    return solve


def _rt_flux_setup(space: NDSpace, materials):
    """(rt, per-bucket setup, M_RT solver) cache shared by the grad-flux
    estimator and the Floquet k x E RT projection (RT order = solver
    order - 1, matching the reference's B-field space)."""
    cache = getattr(space, "_gradflux_cache", None)
    if cache is not None:
        return cache
    from palace_tpu.fem.rt import RTSpace

    mesh = space.mesh
    sdim = mesh.nodes.shape[1]
    rt = RTSpace(mesh, space.order - 1)
    # Per-bucket data: physical ND/RT tables, permittivities.
    setup = []
    mass_tables = []
    for bi, b in enumerate(mesh.buckets):
        q = default_qorder(space.order, b.geo_order, b.geom)
        gf = geom_mod.compute(mesh.nodes, b, q)
        V, _ = space.basis_tables(b.geom, gf.qpts)
        Vr = rt.basis_tables(b.geom, gf.qpts)  # (nq, ndr, sdim)
        # ND physical values J^-T u_ref.
        ndphys = np.einsum("eqrs,qnr->eqns", gf.Jinv, V)
        # RT physical values J w_ref / detJ (signed Piola).
        rtphys = np.einsum("eqsr,qnr->eqns", gf.J, Vr) / gf.detJ[
            :, :, None, None]
        if rt.elem_signs[bi] is not None:
            # Hex RT face-orientation signs (fem/rt_hex.py).
            rtphys = rtphys * rt.elem_signs[bi][:, None, :, None]
        eps = materials.attr_tensor(
            {a: np.real(t) for a, t in materials.permittivity.items()},
            b.attr)[:, :sdim, :sdim]
        setup.append((gf, ndphys, rtphys, eps, bi))
        A = np.einsum("eqns,eqms,eq->enm", rtphys, rtphys, gf.wdetJ)
        mass_tables.append((rt.elem_dofs[bi], A))
    from palace_tpu.ops.partial import BucketTables, PAOperator

    Mrt = PAOperator(rt.num_dofs,
                     [BucketTables(gidx=g, A=A) for g, A in mass_tables])
    solve = _solver(Mrt)
    cache = space._gradflux_cache = (rt, setup, solve)
    return cache


def grad_flux_indicators(space: NDSpace, materials, E: np.ndarray
                         ) -> np.ndarray:
    """Squared per-element grad-flux indicators for an ND field E: the
    discontinuous electric flux eps E is projected onto RT_{p-1} and the
    energy-norm mismatch integrated per element,

        eta_K^2 = int_K |sqrt(eps) E - sqrt(eps^-1) D|^2,   M_RT D = (eps E, w)

    (reference: palace/linalg/errorestimator.cpp GradFluxErrorEstimator,
    qfunctions/33/hcurlhdiv_error_33_qf.h; RT order = solver order - 1,
    spaceoperator.cpp:44)."""
    from palace_tpu.fem.rt import RTSpace

    mesh = space.mesh
    sdim = mesh.nodes.shape[1]
    signs_list = getattr(space, "elem_signs", [None] * len(mesh.buckets))
    E = np.asarray(E)
    cplx = np.iscomplexobj(E)
    ftype = np.complex128 if cplx else np.float64

    rt, setup, solve = _rt_flux_setup(space, materials)

    per_bucket = []
    rows_b = np.zeros(rt.num_dofs, ftype)
    for (gf, ndphys, rtphys, eps, bi) in setup:
        ue = E[space.elem_dofs[bi]]
        if signs_list[bi] is not None:
            ue = ue * signs_list[bi]
        Eq = np.einsum("eqns,en->eqs", ndphys, ue)
        per_bucket.append((gf, rtphys, eps, Eq, bi))
        flux = np.einsum("est,eqt->eqs", eps, Eq)
        c = np.einsum("eqns,eqs,eq->en", rtphys, flux, gf.wdetJ)
        np.add.at(rows_b, rt.elem_dofs[bi].ravel(), c.ravel())
    D = solve(rows_b.real) + (1j * solve(rows_b.imag) if cplx else 0.0)

    num_elem = sum(b.num_elem for b in mesh.buckets)
    eta2 = np.zeros(num_elem)
    ofs = 0
    for (gf, rtphys, eps, Eq, bi) in per_bucket:
        b = mesh.buckets[bi]
        Dq = np.einsum("eqns,en->eqs", rtphys, D[rt.elem_dofs[bi]])
        sq = _matsqrt_batch(eps)
        isq = _matsqrt_batch(np.linalg.inv(eps))
        diff = (np.einsum("est,eqt->eqs", sq, Eq)
                - np.einsum("est,eqt->eqs", isq, Dq))
        eta2[ofs:ofs + b.num_elem] = np.real(
            np.einsum("eqs,eqs,eq->e", np.conj(diff), diff, gf.wdetJ))
        ofs += b.num_elem
    return eta2


def _matsqrt_batch(A: np.ndarray) -> np.ndarray:
    """Principal square roots of a batch of symmetric PSD tensors."""
    w, V = np.linalg.eigh(0.5 * (A + np.swapaxes(A, -1, -2)))
    return np.einsum("...ij,...j,...kj->...ik", V, np.sqrt(
        np.maximum(w, 0.0)), V)


def timedependent_flux_indicators(space: NDSpace, materials, E: np.ndarray,
                                  b_scale: complex) -> np.ndarray:
    """Combined grad + curl squared indicators for frequency-domain fields
    where B = b_scale * curl E (reference: errorestimator.cpp
    TimeDependentFluxErrorEstimator::AddErrorIndicator sums the grad and
    curl estimates before the square root)."""
    return (grad_flux_indicators(space, materials, E)
            + abs(b_scale) ** 2 * curl_flux_indicators(space, materials, E))


def curl_flux_indicators(space: NDSpace, materials, E: np.ndarray,
                         floquet_k: np.ndarray | None = None) -> np.ndarray:
    """Squared, un-normalized per-element indicators for an ND field E
    (complex supported: real and imaginary parts both contribute).

    floquet_k: Bloch wave vector; the estimated flux becomes the physical
    B ~ curl E - i k x E (reference: eigensolver.cpp:436-438 /
    linalg/floquetcorrection.hpp B-field correction before estimation)."""
    mesh = space.mesh
    sdim = mesh.nodes.shape[1]
    signs_list = getattr(space, "elem_signs", [None] * len(mesh.buckets))
    E = np.asarray(E)
    cplx = np.iscomplexobj(E)
    ftype = np.complex128 if cplx else np.float64

    # Per-bucket raw flux at quadrature points (geometry/basis cached on
    # the space: transient drivers call this every time step).
    cache = getattr(space, "_curlflux_cache", None)
    if cache is None:
        cache = []
        for bi, b in enumerate(mesh.buckets):
            q = default_qorder(space.order, b.geo_order, b.geom)
            gf = geom_mod.compute(mesh.nodes, b, q)
            V, C = space.basis_tables(b.geom, gf.qpts)
            muinv = materials.attr_tensor(materials.inv_permeability, b.attr)
            cache.append((gf, V, C, muinv))
        space._curlflux_cache = cache
    per_bucket = []
    for bi, (gf, V, C, muinv) in enumerate(cache):
        ue = E[space.elem_dofs[bi]]
        if signs_list[bi] is not None:
            ue = ue * signs_list[bi]
        if sdim == 2:
            curl = np.einsum("qn,en->eq", C[..., 0], ue) / gf.detJ
        else:
            curl_ref = np.einsum("qnc,en->eqc", C, ue)
            curl = np.einsum("sreq,eqr->eqs", gf.Jp,
                             curl_ref) / gf.detJ[..., None]
        per_bucket.append((gf, V, C, muinv, curl, bi))

    if floquet_k is not None and sdim == 3:
        # Floquet B correction: iωB = curl E - i k x E, with k x E fed in
        # as its L2 projection onto RT (reference: eigensolver.cpp:433-439
        # B += (1/ω) FloquetCorrSolver(E) which solves M_RT y = (k x E, w)
        # on the B-field RT space, linalg/floquetcorrection.cpp:26-80).
        # The pointwise (unprojected) k x E gives 2.9e-2 on the
        # cylinder_floquet indicator Norm; the RT projection is exact.
        rt, rsetup, rsolve = _rt_flux_setup(space, materials)
        b_rt = np.zeros(rt.num_dofs, ftype)
        eqs = []
        for (gf, V, C, muinv, curl, bi) in per_bucket:
            ue = E[space.elem_dofs[bi]]
            if signs_list[bi] is not None:
                ue = ue * signs_list[bi]
            ndphys, rtphys = rsetup[bi][1], rsetup[bi][2]
            Eq = np.einsum("eqns,en->eqs", ndphys, ue)
            cx = np.cross(np.broadcast_to(floquet_k, Eq.shape), Eq)
            c = np.einsum("eqns,eqs,eq->en", rtphys, cx, gf.wdetJ)
            np.add.at(b_rt, rt.elem_dofs[bi].ravel(), c.ravel())
        y = rsolve(b_rt.real) + (1j * rsolve(b_rt.imag) if cplx else 0.0)
        corrected = []
        for (gf, V, C, muinv, curl, bi) in per_bucket:
            rtphys = rsetup[bi][2]
            yq = np.einsum("eqns,en->eqs", rtphys, y[rt.elem_dofs[bi]])
            corrected.append((gf, V, C, muinv, curl - 1j * yq, bi))
        per_bucket = corrected

    num_elem = sum(b.num_elem for b in mesh.buckets)
    eta2 = np.zeros(num_elem)
    ofs = 0

    if sdim == 2:
        # Out-of-plane scalar flux mu^-1_zz curl E projected onto scalar H1.
        from palace_tpu.fem.h1 import H1Space
        from palace_tpu.fem.operators import h1_operator

        h1 = H1Space(mesh, space.order)
        Mh = h1_operator(h1, mass_coef={int(a): np.eye(3)
                                        for a in mesh.attributes()})
        bh = np.zeros(h1.num_dofs, ftype)
        for (gf, V, C, muinv, curl, bi) in per_bucket:
            B = h1.basis(mesh.buckets[bi].geom).eval(gf.qpts)
            flux = curl * muinv[:, 2:3, 2]
            c = np.einsum("qn,eq,eq->en", B, flux, gf.wdetJ)
            np.add.at(bh, h1.elem_dofs[bi].ravel(), c.ravel())
        hsolve = _solver(Mh)
        w = hsolve(bh.real) + (1j * hsolve(bh.imag) if cplx else 0.0)
        for (gf, V, C, muinv, curl, bi) in per_bucket:
            b = mesh.buckets[bi]
            B = h1.basis(b.geom).eval(gf.qpts)
            wq = np.einsum("qn,en->eq", B, w[h1.elem_dofs[bi]])
            mu_zz = 1.0 / muinv[:, 2, 2]
            diff = curl - mu_zz[:, None] * wq
            eta2[ofs:ofs + b.num_elem] = np.einsum(
                "eq,eq,eq->e", np.abs(diff) ** 2,
                np.broadcast_to(muinv[:, 2:3, 2], diff.shape), gf.wdetJ)
            ofs += b.num_elem
        return eta2

    # 3D: project F = mu^-1 curl E onto the ND space (one vector rhs; the
    # test functions transform covariantly, v_phys = J^-T v_ref).
    mcache = getattr(space, "_curlflux_msolve", None)
    if mcache is None:
        Mop = nd_operator(space, mass_coef={int(a): np.eye(3)
                                            for a in mesh.attributes()})
        vphys_all = [np.einsum("eqrs,qnr->eqns", gf.Jinv, V)
                     for (gf, V, C, muinv) in space._curlflux_cache]
        mcache = space._curlflux_msolve = (_solver(Mop), vphys_all)
    msolve, vphys_all = mcache
    b_vec = np.zeros(space.num_dofs, ftype)
    for (gf, V, C, muinv, curl, bi) in per_bucket:
        flux = np.einsum("est,eqt->eqs", muinv[:, :sdim, :sdim], curl)
        vphys = vphys_all[bi]
        c = np.einsum("eqns,eqs,eq->en", vphys, flux, gf.wdetJ)
        if signs_list[bi] is not None:
            c = c * signs_list[bi]
        np.add.at(b_vec, space.elem_dofs[bi].ravel(), c.ravel())
    w = msolve(b_vec.real) + (1j * msolve(b_vec.imag) if cplx else 0.0)

    for (gf, V, C, muinv, curl, bi) in per_bucket:
        b = mesh.buckets[bi]
        we = w[space.elem_dofs[bi]]
        if signs_list[bi] is not None:
            we = we * signs_list[bi]
        vphys = vphys_all[bi]
        wq = np.einsum("eqns,en->eqs", vphys, we)
        mu = np.linalg.inv(muinv[:, :sdim, :sdim])
        diff = curl - np.einsum("est,eqt->eqs", mu, wq)
        mid = np.einsum("est,eqt->eqs", muinv[:, :sdim, :sdim], diff)
        eta2[ofs:ofs + b.num_elem] = np.real(
            np.einsum("eqs,eqs,eq->e", np.conj(diff), mid, gf.wdetJ))
        ofs += b.num_elem
    return eta2
