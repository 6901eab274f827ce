"""Shared driver utilities: mesh preparation, solves, measurement tables."""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from palace_tpu.config import IoData, ValueType
from palace_tpu.fem import evaluation
from palace_tpu.fem.h1 import H1Space
from palace_tpu.fem.operators import default_qorder, h1_operator
from palace_tpu.linalg.iterative import cg
from palace_tpu.linalg.smoothers import jacobi
from palace_tpu.mesh.mesh import Mesh, load_mesh
from palace_tpu.post.tables import Column, Table, index_column


def print_log(iodata: IoData, msg: str):
    if iodata.problem.verbose > 0:
        print(f"[palace-tpu] {msg}", flush=True)


def prepare_mesh(iodata: IoData) -> Mesh:
    """Load the mesh, set units (Lc defaults to the max bounding-box extent,
    reference: palace/utils/geodata.cpp:411-423), nondimensionalize coords."""
    mesh = load_mesh(iodata.mesh_path())
    bbmin, bbmax = mesh.bounding_box()
    iodata.set_units_from_mesh(float((bbmax - bbmin).max()))
    mesh.scale_coordinates(iodata.units.mesh_length_scale)
    if iodata.model.refinement.uniform_ref_levels > 0:
        from palace_tpu.mesh.refine import refine_uniform

        mesh = refine_uniform(mesh, iodata.model.refinement.uniform_ref_levels)
    if iodata.model.crack_bdr_elements:
        # Decouple the two sides of interior BC sheets (reference:
        # palace/utils/geodata.cpp CrackInternalBoundaryElements).  Runs
        # after uniform refinement: refinement's coordinate-keyed node
        # dedup would re-merge the duplicated (coincident) crack nodes.
        from palace_tpu.mesh.crack import (crack_attributes,
                                           crack_internal_boundaries,
                                           local_edge_split)

        attrs = crack_attributes(iodata)
        n_split = n_its = 0
        while True:
            cracked, info = crack_internal_boundaries(mesh, attrs)
            if (not info.interior_seam_edges
                    or not iodata.model.refine_crack_elements):
                break
            # Interior seam edges (both endpoints on the crack rim) cannot
            # be decoupled by vertex duplication; locally refine and
            # re-crack (reference: geodata.cpp:2905-3010 retry loop).
            # Non-periodic tet meshes use MFEM-parity marked-edge bisection
            # (hacked-length marking + conforming closure) so the refined
            # mesh matches the reference's; periodic/non-tet meshes use the
            # edge-fan LocalEdgeSplit path, as the reference does.
            from palace_tpu.mesh.mfem_refine import (is_pure_tet,
                                                     seam_bisection_refine)

            periodic = bool(iodata.boundaries.periodic)
            try:
                ne = mesh.num_elements
                if is_pure_tet(mesh) and not periodic:
                    mesh = seam_bisection_refine(
                        mesh, info.interior_seam_edges,
                        info.seam_refine_elems, first_pass=(n_its == 0))
                else:
                    mesh = local_edge_split(mesh, info.interior_seam_edges)
                n_split += mesh.num_elements - ne
                n_its += 1
            except NotImplementedError:
                break
        mesh = cracked
        if info.n_crack_facets:
            print_log(iodata,
                      f"Cracked {info.n_crack_facets} interior boundary "
                      f"facets (attrs {sorted(info.cracked_attrs)}, "
                      f"{info.n_dup_nodes} duplicated nodes)")
        if n_split:
            print_log(iodata,
                      f"Added {n_split} elements in {n_its} iterations of "
                      "local bisection for under-resolved interior "
                      "boundaries")
        if info.n_interior_seam_edges:
            print_log(iodata,
                      f"  WARNING: {info.n_interior_seam_edges} interior "
                      "seam edges remain coupled")
    if iodata.boundaries.periodic:
        # Floquet phase (nonzero FloquetWaveVector) is handled by the
        # SpaceOperator volume terms on the plainly-identified periodic mesh
        # (E_phys = E_per e^{-ik.x}; models/spaceoperator.py:_build_floquet).
        from palace_tpu.mesh.periodic import apply_periodic

        n = apply_periodic(mesh, iodata.boundaries.periodic,
                           iodata.units.mesh_length_scale)
        print_log(iodata, f"Periodic boundaries: identified {n} node pairs")
    return mesh


def make_output_dir(iodata: IoData, output_dir: Optional[str]) -> str:
    if output_dir is None:
        base = os.path.dirname(os.path.abspath(iodata.path or "."))
        output_dir = os.path.join(base, iodata.problem.output)
    os.makedirs(output_dir, exist_ok=True)
    return output_dir


def solve_spd(iodata: IoData, eliminated_op, raw_op, b, ess_mask
              ) -> Tuple[jnp.ndarray, int]:
    """CG with Jacobi preconditioning for SPD systems.

    With more than one visible device, routes through the dof-sharded
    multi-chip CG (parallel/dofsharded.py — SFC partition, packed interior
    blocks, interface-only psum; the production analog of the reference's
    hypre ParCSR solves over MPI, palace/linalg/rap.hpp:18-39)."""
    ln = iodata.solver.linear
    import jax

    if (jax.device_count() > 1
            and os.environ.get("PALACE_TPU_MULTICHIP", "1") != "0"
            and getattr(raw_op, "space", None) is not None
            and raw_op.mode == "element"):
        from palace_tpu.parallel import dofsharded as _ds

        cache = getattr(raw_op, "_dofsharded_cache", None)
        if cache is None:
            dmesh = _ds.make_cells_mesh()
            part = _ds.partition_for_space(raw_op.space,
                                           dmesh.shape["cells"])
            shop = _ds.shard_pa_operator(raw_op, part, dmesh)
            cache = raw_op._dofsharded_cache = (part, dmesh, shop)
        part, dmesh, shop = cache
        x, its, relres, _ = _ds.solve_spd_sharded(
            raw_op, np.asarray(b), np.asarray(ess_mask), mesh=dmesh,
            part=part, sharded=shop, tol=ln.tol,
            max_its=max(ln.max_its, 1000))
        if relres > ln.tol:
            print_log(iodata, f"  WARNING: sharded CG did not converge "
                              f"(relres={relres:.2e})")
        return jnp.asarray(x), its
    M = jacobi(raw_op.diagonal(), jnp.asarray(ess_mask))
    res = cg(eliminated_op, b, M=M, tol=ln.tol, max_its=max(ln.max_its, 1000))
    if not bool(res.converged):
        print_log(iodata, f"  WARNING: CG did not converge "
                          f"(relres={float(res.relres):.2e})")
    return res.x, int(res.iterations)


def nondim_point(iodata: IoData, p) -> np.ndarray:
    """Config coordinates (mesh L0 units) -> nondimensional frame."""
    return np.asarray(p, float) / iodata.units.mesh_length_scale


# ---------------------------------------------------------------------------
# Measurement tables


def domain_energies(iodata: IoData, op, space: H1Space, u: np.ndarray
                    ) -> Tuple[float, Dict[int, float]]:
    """(total, per-config-index) field energy 0.5 u^T A u, nondimensional."""
    per_bucket = op.element_energy(jnp.asarray(u))
    total = float(sum(float(jnp.sum(e)) for e in per_bucket))
    per_idx = {}
    for ecfg in iodata.domains.energies:
        s = 0.0
        for b, e in zip(space.mesh.buckets, per_bucket):
            m = np.isin(b.attr, ecfg.attributes)
            s += float(jnp.sum(jnp.asarray(e) * jnp.asarray(m)))
        per_idx[ecfg.index] = s
    return total, per_idx


def write_domain_energy_table(iodata: IoData, post_dir: str, op, space: H1Space,
                              steps: List[Tuple[float, np.ndarray]],
                              kind: str = "electric",
                              index_header: str = "i",
                              mag_op=None, mag_steps=None):
    """domain-E.csv (reference: postoperatorcsv.cpp domain energy table)."""
    units = iodata.units
    J = units.scale_factor(ValueType.ENERGY)
    t = Table()
    t.add(index_column(index_header))
    t.add(Column("Ee", "E_elec (J)"))
    t.add(Column("Em", "E_mag (J)"))
    t.add(Column("Ec", "E_cap (J)"))
    t.add(Column("Ei", "E_ind (J)"))
    for ecfg in iodata.domains.energies:
        t.add(Column(f"Ee{ecfg.index}", f"E_elec[{ecfg.index}] (J)"))
        t.add(Column(f"pe{ecfg.index}", f"p_elec[{ecfg.index}]"))
        t.add(Column(f"Em{ecfg.index}", f"E_mag[{ecfg.index}] (J)"))
        t.add(Column(f"pm{ecfg.index}", f"p_mag[{ecfg.index}]"))
    for step_i, (idx, u) in enumerate(steps):
        total, per = domain_energies(iodata, op, space, u)
        if mag_op is not None:
            mtotal, mper = domain_energies(iodata, mag_op, space, mag_steps[step_i][1])
        else:
            mtotal, mper = 0.0, {k: 0.0 for k in per}
        elec = kind == "electric"
        Ee, Em = (total, mtotal) if elec else (mtotal, total)
        t.col("i").data.append(idx)
        t.col("Ee").data.append(Ee * J)
        t.col("Em").data.append(Em * J)
        t.col("Ec").data.append(0.0)
        t.col("Ei").data.append(0.0)
        for ecfg in iodata.domains.energies:
            pe = per.get(ecfg.index, 0.0)
            pm = mper.get(ecfg.index, 0.0)
            eE, eM = (pe, pm) if elec else (pm, pe)
            t.col(f"Ee{ecfg.index}").data.append(eE * J)
            t.col(f"pe{ecfg.index}").data.append(eE / Ee if Ee > 0 else 0.0)
            t.col(f"Em{ecfg.index}").data.append(eM * J)
            t.col(f"pm{ecfg.index}").data.append(eM / Em if Em > 0 else 0.0)
    t.write(os.path.join(post_dir, "domain-E.csv"))


def write_probe_table(iodata: IoData, post_dir: str, space: H1Space,
                      steps: List[Tuple[float, np.ndarray]],
                      field: str = "E", negate: bool = False,
                      index_header: str = "i"):
    """probe-E.csv for scalar-potential problems: E = -grad V at probes."""
    if not iodata.domains.probes:
        return
    units = iodata.units
    scale = units.scale_factor(
        ValueType.FIELD_E if field == "E" else ValueType.FIELD_B
    )
    locator = evaluation.PointLocator(space.mesh)
    pts = np.array([nondim_point(iodata, p.center) for p in iodata.domains.probes])
    locs = locator.locate(pts)
    t = Table()
    t.add(index_column(index_header))
    dims = ["x", "y", "z"][: space.mesh.nodes.shape[1]]
    unit = "(V/m)" if field == "E" else "(Wb/m²)"
    for p in iodata.domains.probes:
        for d in dims:
            t.add(Column(f"{field}{d}{p.index}", f"{field}_{d}[{p.index}] {unit}"))
    for idx, u in steps:
        _, grads = evaluation.eval_h1(space, np.asarray(u), locs)
        t.col("i").data.append(idx)
        for pi, p in enumerate(iodata.domains.probes):
            g = -grads[pi] if negate else grads[pi]
            for di, d in enumerate(dims):
                t.col(f"{field}{d}{p.index}").data.append(float(g[di]) * scale)
    t.write(os.path.join(post_dir, f"probe-{field}.csv"))


def write_surface_flux_table(iodata: IoData, post_dir: str, space: H1Space,
                             materials, steps: List[Tuple[float, np.ndarray]],
                             index_header: str = "i"):
    """surface-F.csv: electric flux (charge) Phi = -int (eps grad V) . n dS
    with n oriented away from the surface center (reference:
    palace/models/surfacepostoperator.cpp:82-117)."""
    fluxes = iodata.boundaries.surface_fluxes
    if not fluxes:
        return
    units = iodata.units
    t = Table()
    t.add(index_column(index_header))
    traces = {}
    qorder = 2 * space.order + 2
    for f in fluxes:
        if f.type != "Electric":
            raise NotImplementedError(f"surface flux type {f.type} for H1 problems")
        t.add(Column(f"F{f.index}", f"Φ_elec[{f.index}] (C)"))
        center = (nondim_point(iodata, f.center) if f.center is not None else
                  _surface_bbox_center(space.mesh, f.attributes))
        traces[f.index] = evaluation.boundary_trace(
            space.mesh, f.attributes, qorder, center=center
        )
    coul = units.scale_factor(ValueType.CAPACITANCE) * units.scale_factor(
        ValueType.VOLTAGE
    )
    for idx, u in steps:
        t.col("i").data.append(idx)
        for f in fluxes:
            tr = traces[f.index]
            grads = evaluation.trace_gradient(space, np.asarray(u), tr)
            eps = materials.attr_tensor(
                materials.permittivity,
                _trace_attrs(space.mesh, tr),
            )[:, : grads.shape[-1], : grads.shape[-1]]
            D = -np.einsum("est,eqt->eqs", eps, grads)
            flux = float(np.einsum("eq,eqs,eqs->", tr.wdetJ, D, tr.normal))
            t.col(f"F{f.index}").data.append(flux * coul)
    t.write(os.path.join(post_dir, "surface-F.csv"))


def _trace_attrs(mesh: Mesh, tr) -> np.ndarray:
    """Domain attribute of the volume element adjacent to each trace facet."""
    out = np.empty(len(tr.elem), np.int32)
    for bi, b in enumerate(mesh.buckets):
        sel = tr.bucket == bi
        out[sel] = b.attr[tr.elem[sel]]
    return out


def _surface_bbox_center(mesh: Mesh, attrs) -> np.ndarray:
    pts = []
    for b in mesh.bdr_buckets:
        sel = np.isin(b.attr, list(attrs))
        if sel.any():
            pts.append(mesh.nodes[np.unique(b.conn[sel].ravel())])
    allp = np.concatenate(pts)
    return 0.5 * (allp.min(axis=0) + allp.max(axis=0))


# ---------------------------------------------------------------------------
# Error indicators (ZZ-style flux recovery, reference:
# palace/linalg/errorestimator.hpp:62-65)


def compute_error_indicator_h1(iodata: IoData, space: H1Space, materials,
                               u: np.ndarray) -> np.ndarray:
    """Per-element error indicators eta_K for the gradient flux eps grad V.

    Uses smooth flux recovery by global L2 projection of eps grad V onto the
    vector H1 space (the reference uses an RT-space projection; values differ
    slightly but behave equivalently for AMR marking).  Indicators are
    normalized by the total field energy: eta_K <- sqrt(0.5 eta_K^2 / E_t).
    """
    mesh = space.mesh
    sdim = mesh.nodes.shape[1]
    from palace_tpu.mesh import geometry as geom_mod
    from palace_tpu.ops.partial import PAOperator

    # Mass operator of the scalar space (for componentwise projection).
    Mop = h1_operator(space, mass_coef={int(a): np.eye(3)
                                        for a in mesh.attributes()})
    Mdiag = Mop.diagonal()
    Mprec = jacobi(Mdiag)

    # RHS: (eps grad V, v e_d) per component, and element energies.
    rhs = np.zeros((sdim, space.num_dofs))
    eta2 = []
    flux_q = []  # per bucket: (E, nq, sdim) flux at qpoints, wdetJ
    for bi, b in enumerate(mesh.buckets):
        import palace_tpu.fem.reference as ref

        q = default_qorder(space.order, b.geo_order, b.geom)
        gf = geom_mod.compute(mesh.nodes, b, q)
        basis = space.basis(b.geom)
        B = basis.eval(gf.qpts)
        G = basis.eval_grad(gf.qpts)
        ue = np.asarray(u)[space.elem_dofs[bi]]
        gref = np.einsum("qnr,en->eqr", G, ue)
        gphys = np.einsum("eqrs,eqr->eqs", gf.Jinv, gref)
        eps = materials.attr_tensor(materials.permittivity, b.attr)[:, :sdim, :sdim]
        flux = np.einsum("est,eqt->eqs", eps, gphys)
        flux_q.append((flux, gf.wdetJ, B, b, bi))
        contrib = np.einsum("eqs,qn,eq->ens", flux, B, gf.wdetJ)
        for d in range(sdim):
            np.add.at(rhs[d], space.elem_dofs[bi].ravel(), contrib[..., d].ravel())

    # Solve M w_d = rhs_d per component.
    w = np.zeros_like(rhs)
    for d in range(sdim):
        res = cg(Mop, jnp.asarray(rhs[d]), M=Mprec, tol=1e-10, max_its=500)
        w[d] = np.asarray(res.x)

    # Element integrals ||flux - w||^2.
    num_elem = sum(b.num_elem for b in mesh.buckets)
    eta2 = np.zeros(num_elem)
    total_energy = 0.0
    ofs = 0
    for flux, wdetJ, B, b, bi in flux_q:
        we = w[:, space.elem_dofs[bi]]  # (sdim, E, nd)
        wq = np.einsum("qn,den->eqd", B, we.transpose(0, 1, 2))
        diff = flux - wq
        eta2[ofs : ofs + b.num_elem] = np.einsum("eqs,eqs,eq->e", diff, diff, wdetJ)
        ofs += b.num_elem
    return eta2  # squared, un-normalized; caller normalizes


def write_error_indicators(post_dir: str, eta2_steps: List[np.ndarray],
                           energies: Optional[List[float]] = None):
    """error-indicators.csv: Norm/Min/Max/Mean of combined indicators
    (reference: palace/fem/errorindicator.cpp:11-48)."""
    combined = None
    n = 0
    for i, eta2 in enumerate(eta2_steps):
        Et = energies[i] if energies else None
        eta = np.sqrt(eta2 * (0.5 / Et if Et and Et > 0 else 1.0))
        if combined is None:
            combined = eta
            n = 1
        else:
            combined = np.sqrt((combined**2 * n + eta**2) / (n + 1))
            n += 1
    if combined is None:
        combined = np.zeros(1)
    t = Table()
    t.add(Column("norm", "Norm"))
    t.add(Column("min", "Minimum"))
    t.add(Column("max", "Maximum"))
    t.add(Column("mean", "Mean"))
    t.col("norm").data.append(float(np.sqrt((combined**2).sum())))
    t.col("min").data.append(float(combined.min()))
    t.col("max").data.append(float(combined.max()))
    t.col("mean").data.append(float(combined.mean()))
    t.write(os.path.join(post_dir, "error-indicators.csv"))
