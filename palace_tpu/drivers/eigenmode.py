"""Eigenmode driver (reference: palace/drivers/eigensolver.cpp).

Solves K x = omega^2 M x for the damped Maxwell cavity modes: K the
mu^-1 curl-curl operator, M the (complex, lossy) permittivity mass.
Eigenvectors are normalized to unit M-norm so the per-mode electric field
energy is exactly 1/2 in nondimensional units (reference:
palace/linalg/slepc.cpp:470-510 GetEigenvectorNorm/RescaleEigenvectors).
"""

from __future__ import annotations

import os
import time

import jax.numpy as jnp
import numpy as np

from palace_tpu.config import IoData, ValueType
from palace_tpu.drivers.common import (
    make_output_dir,
    nondim_point,
    prepare_mesh,
    print_log,
    write_error_indicators,
)
from palace_tpu.fem import evaluation
from palace_tpu.fem.nd import NDSpace
from palace_tpu.fem.nd_operators import nd_operator
from palace_tpu.linalg.eig import shift_invert_eigs
from palace_tpu.models.materials import MaterialOperator
from palace_tpu.post.tables import Column, Table, index_column


def solve(iodata: IoData, output_dir: str | None = None):
    t0 = time.time()
    mesh = prepare_mesh(iodata)
    from palace_tpu.mesh.mesh import canonicalize_simplices

    canonicalize_simplices(mesh)
    post_dir = make_output_dir(iodata, output_dir)
    units = iodata.units

    materials = MaterialOperator.build(iodata)
    space = NDSpace(mesh, iodata.solver.order)
    print_log(iodata, f"eigenmode: {space.num_dofs} dofs, "
                      f"{mesh.num_elements} elements")

    if any(np.any(np.asarray(t) != 0.0) for t in materials.conductivity.values()):
        raise NotImplementedError(
            "eigenmode with conductive materials (quadratic EVP) lands with "
            "the driven-solver damping work"
        )

    K = nd_operator(space, curl_coef=materials.inv_permeability)
    Kcsr = K.assemble_csr()

    lossy = materials.has_loss()
    eps = materials.complex_permittivity() if lossy else materials.permittivity
    # Assemble (complex) mass CSR: real and imag parts separately.
    eps_re = {a: np.real(t) for a, t in eps.items()}
    M_re = nd_operator(space, mass_coef=eps_re).assemble_csr()
    if lossy:
        eps_im = {a: np.imag(t) for a, t in eps.items()}
        M_im = nd_operator(space, mass_coef=eps_im).assemble_csr()
        Mcsr = (M_re + 1j * M_im).tocsr()
    else:
        Mcsr = M_re

    ess = space.boundary_dofs(iodata.boundaries.pec)

    cfg = iodata.solver.eigenmode
    f_t = units.nondimensionalize(ValueType.FREQUENCY, cfg.target)
    sigma = (2 * np.pi * f_t) ** 2
    nev = max(cfg.n, 1)
    # Request extra vectors: the gradient-nullspace cluster at lambda = 0 is
    # filtered below, so over-allocate to still deliver n physical modes.
    result = shift_invert_eigs(
        Kcsr, Mcsr, ess, sigma, 2 * nev + 8, tol=cfg.tol
    )

    # omega = sqrt(lambda), ascending; drop the gradient-nullspace zero
    # cluster (the role of the div-free projection, reference:
    # palace/linalg/divfree.hpp:29-34).
    lam = result.eigenvalues.astype(complex)
    keep = np.real(lam) > max(1e-8, 1e-3 * sigma)
    lam = lam[keep]
    omega = np.sqrt(lam)
    order = np.argsort(np.real(omega))
    omega = omega[order]
    vecs = result.eigenvectors[:, keep][:, order]
    res = result.residuals[keep][order]
    bkwd = result.backward_errors[keep][order]
    sel = np.arange(len(omega))[: cfg.n]
    omega, vecs, res, bkwd = omega[sel], vecs[:, sel], res[sel], bkwd[sel]

    ghz = units.scale_factor(ValueType.FREQUENCY)
    t = Table()
    t.add(index_column("m"))
    t.add(Column("refreq", "Re{f} (GHz)"))
    t.add(Column("imfreq", "Im{f} (GHz)"))
    t.add(Column("q", "Q"))
    t.add(Column("err_bkwd", "Error (Bkwd.)"))
    t.add(Column("err_abs", "Error (Abs.)"))
    f = omega / (2 * np.pi) * ghz
    for i in range(len(omega)):
        fi = f[i]
        Q = (abs(fi) / (2 * fi.imag)) if fi.imag != 0 else np.inf
        t.col("i").data.append(float(i + 1))
        t.col("refreq").data.append(fi.real)
        t.col("imfreq").data.append(fi.imag)
        t.col("q").data.append(Q if np.isfinite(Q) else 0.0)
        t.col("err_bkwd").data.append(bkwd[i])
        t.col("err_abs").data.append(res[i])
    t.write(os.path.join(post_dir, "eig.csv"))

    # Normalize to unit M-norm and write per-mode energies.
    Escale = units.scale_factor(ValueType.ENERGY)
    td = Table()
    td.add(index_column("m"))
    td.add(Column("Ee", "E_elec (J)"))
    td.add(Column("Em", "E_mag (J)"))
    td.add(Column("Ec", "E_cap (J)"))
    td.add(Column("Ei", "E_ind (J)"))
    for ecfg in iodata.domains.energies:
        td.add(Column(f"Ee{ecfg.index}", f"E_elec[{ecfg.index}] (J)"))
        td.add(Column(f"pe{ecfg.index}", f"p_elec[{ecfg.index}]"))
        td.add(Column(f"Em{ecfg.index}", f"E_mag[{ecfg.index}] (J)"))
        td.add(Column(f"pm{ecfg.index}", f"p_mag[{ecfg.index}]"))
    modes = []
    for i in range(len(omega)):
        x = vecs[:, i]
        mnorm2 = np.real(np.conj(x) @ (Mcsr @ x))
        x = x / np.sqrt(mnorm2)
        modes.append(x)
        Ee = 0.5 * np.real(np.conj(x) @ (M_re @ x))
        # E_mag = 0.5 |1/omega|^2 x^H K x (B = curl E / (-i omega))
        Em = 0.5 * np.real(np.conj(x) @ (Kcsr @ x)) / abs(omega[i]) ** 2
        td.col("i").data.append(float(i + 1))
        td.col("Ee").data.append(Ee * Escale)
        td.col("Em").data.append(Em * Escale)
        td.col("Ec").data.append(0.0)
        td.col("Ei").data.append(0.0)
        for ecfg in iodata.domains.energies:
            # per-attribute energies via element masks
            EeA = _masked_energy(space, M_re_op_cache(space, materials), x,
                                 ecfg.attributes)
            td.col(f"Ee{ecfg.index}").data.append(EeA * Escale)
            td.col(f"pe{ecfg.index}").data.append(EeA / Ee if Ee > 0 else 0.0)
            EmA = _masked_energy(space, K, x, ecfg.attributes) / abs(omega[i]) ** 2
            td.col(f"Em{ecfg.index}").data.append(EmA * Escale)
            td.col(f"pm{ecfg.index}").data.append(EmA / Em if Em > 0 else 0.0)
    td.write(os.path.join(post_dir, "domain-E.csv"))

    # ParaView mode-field output (reference: eigensolver.cpp mode saves).
    if iodata.problem.output_formats.paraview and cfg.n_post > 0 and modes:
        from palace_tpu.post.paraview import ParaviewSaver, nodal_average_nd

        pv = ParaviewSaver(post_dir, "eigenmode", mesh)
        for i in range(min(cfg.n_post, len(modes))):
            x = modes[i]
            Ev = nodal_average_nd(space, np.real(x).copy()) \
                + 1j * nodal_average_nd(space, np.imag(x).copy())
            pv.save(float(i + 1),
                    {"E_real": np.real(Ev), "E_imag": np.imag(Ev)})
        pv.finalize()

    write_error_indicators(post_dir, [np.zeros(mesh.num_elements)])
    print_log(iodata, f"eigenmode done in {time.time() - t0:.1f}s; "
                      f"f[0] = {f[0].real:.6f} GHz")
    from palace_tpu.post import metadata as _metadata
    _metadata.save_problem(post_dir, "Eigenmode", mesh.num_elements,
                           space.num_dofs)
    _metadata.save_timing(post_dir)
    return dict(frequencies_ghz=f, post_dir=post_dir, num_dofs=space.num_dofs,
                modes=np.stack(modes, axis=1) if modes else None)


_mre_cache = {}


def M_re_op_cache(space, materials):
    key = id(space)
    if key not in _mre_cache:
        eps_re = {a: np.real(t) for a, t in
                  (materials.complex_permittivity() if materials.has_loss()
                   else materials.permittivity).items()}
        _mre_cache[key] = nd_operator(space, mass_coef=eps_re)
    return _mre_cache[key]


def _masked_energy(space, op, x, attrs):
    per_bucket = op.element_energy(jnp.asarray(np.real(x)))
    per_bucket_i = op.element_energy(jnp.asarray(np.imag(x)))
    s = 0.0
    for b, er, ei in zip(space.mesh.buckets, per_bucket, per_bucket_i):
        m = np.isin(b.attr, attrs)
        s += float(jnp.sum((jnp.asarray(er) + jnp.asarray(ei)) * jnp.asarray(m)))
    return s
