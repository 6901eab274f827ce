"""Frequency/time-domain Maxwell system assembly on the ND space.

The counterpart of the reference solver's SpaceOperator (reference:
palace/models/spaceoperator.hpp:46-295): builds the K (curl-curl +
inductive boundary), C (conductivity + resistive/absorbing boundary), and
M (permittivity + capacitive boundary) operators, PEC essential dofs, and
the lumped-port excitation RHS, with the driven system

    A(omega) = K + i omega C - omega^2 M            (drivensolver.cpp:176-181)

and measurement functionals (port V/S) as precomputed vectors.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np
import scipy.sparse as sp

from palace_tpu.config import IoData
from palace_tpu.fem.evaluation import boundary_trace
from palace_tpu.fem.nd import NDSpace
from palace_tpu.fem.nd_boundary import (
    NDTraceBasis, boundary_mass_bucket, boundary_rhs, nd_trace_basis,
)
from palace_tpu.fem.nd_operators import nd_operator
from palace_tpu.fem.operators import default_qorder
from palace_tpu.fem.reference import Geom
from palace_tpu.mesh.mesh import Mesh, canonicalize_simplices
from palace_tpu.models.lumpedport import build_lumped_ports
from palace_tpu.models.materials import MaterialOperator
from palace_tpu.ops.partial import BucketTables, PAOperator


def _matsqrt(A: np.ndarray) -> np.ndarray:
    """Principal square root of a symmetric positive(-semi)definite tensor."""
    w, V = np.linalg.eigh(0.5 * (A + A.T))
    return (V * np.sqrt(np.maximum(w, 0.0))) @ V.T


class SpaceOperator:
    """System operators for driven/transient/eigen solves."""

    def __init__(self, iodata: IoData, mesh: Mesh):
        canonicalize_simplices(mesh)
        self.iodata = iodata
        self.mesh = mesh
        self.materials = MaterialOperator.build(iodata)
        self.space = NDSpace(mesh, iodata.solver.order)
        p = iodata.solver.order
        self.bdr_qorder = default_qorder(
            p, mesh.bdr_buckets[0].geo_order if mesh.bdr_buckets else 1, Geom.TRI
        )
        self.ports = build_lumped_ports(iodata, mesh, self.bdr_qorder)

        # PEC essential dofs (reference: spaceoperator.hpp:56-57).
        pec = list(iodata.boundaries.pec)
        self.ess_dofs = self.space.boundary_dofs(pec) if pec else np.zeros(0, np.int64)
        self.ess_mask = np.zeros(self.space.num_dofs, bool)
        self.ess_mask[self.ess_dofs] = True

        self._build_domain()
        self._build_boundary()
        self._port_trace_bases: Dict[int, List[NDTraceBasis]] = {
            idx: [nd_trace_basis(self.space, tr) for tr in port.traces]
            for idx, port in self.ports.items()
        }

        # Surface current sources (reference:
        # palace/models/surfacecurrentoperator.cpp).
        self._surface_currents = []
        for sc in iodata.boundaries.surface_currents:
            from palace_tpu.models.lumpedport import (
                CoaxialElement, UniformElement)

            elems, tbs = [], []
            el_list = sc.elements if sc.elements else [
                dict(attributes=sc.attributes, direction=sc.direction)]
            for el in el_list:
                attrs = el["attributes"] if isinstance(el, dict) else el.attributes
                d = el["direction"] if isinstance(el, dict) else el.direction
                is_coax = isinstance(d, str) and d.strip().upper().endswith("R")
                if is_coax:
                    e = CoaxialElement.build(mesh, attrs, d)
                else:
                    if isinstance(d, str):
                        s = d.strip().upper()
                        sign = -1.0 if s.startswith("-") else 1.0
                        axis = {"X": 0, "Y": 1, "Z": 2}[s[-1]]
                        vec = np.zeros(mesh.nodes.shape[1])
                        vec[axis] = sign
                    else:
                        vec = np.asarray(d, float)
                    e = UniformElement.build(mesh, attrs, vec)
                elems.append(e)
                tbs.append(nd_trace_basis(self.space, boundary_trace(
                    mesh, attrs, self.bdr_qorder)))
            self._surface_currents.append((sc, elems, tbs))

        # Floquet diffraction-order ports (reference:
        # palace/models/floquetportoperator.cpp).
        self.floquet_ports: Dict[int, object] = {}
        if iodata.boundaries.floquet_ports:
            from palace_tpu.config.schema import ProblemType
            from palace_tpu.models.floquetport import FloquetPortData as FPD

            if iodata.problem.type is not ProblemType.DRIVEN:
                raise ValueError(
                    "Floquet ports are only available for driven solves "
                    "(reference: floquetportoperator.cpp:931-933)")
            k = (self.floquet_k if self.floquet_k is not None
                 else np.zeros(3))
            for cfg in iodata.boundaries.floquet_ports:
                fp = FPD(iodata, mesh, self.space, cfg, self.materials, k,
                         self.floquet_omega_ref, self.bdr_qorder)
                self.floquet_ports[fp.index] = fp

        # Wave ports (reference: palace/models/waveportoperator.cpp).
        self.wave_ports: Dict[int, object] = {}
        self._wp_trace_bases: Dict[int, NDTraceBasis] = {}
        if iodata.boundaries.wave_ports:
            from palace_tpu.models.waveport import WavePortData

            dbc = pec + list(iodata.boundaries.wave_port_pec)
            for wcfg in iodata.boundaries.wave_ports:
                # Other wave ports' surfaces are Dirichlet for this port's
                # mode problem: when two ports touch (e.g. the per-slot CPW
                # half-cross-section ports), their shared edge must carry
                # E_t = 0 (reference: waveportoperator.cpp:1083-1131
                # port_dbc_bcs = PEC + AuxPEC + other ports' attributes).
                other = [a for o in iodata.boundaries.wave_ports
                         if o.index != wcfg.index for a in o.attributes
                         if a not in wcfg.attributes]
                wp = WavePortData(iodata, mesh, wcfg, self.materials,
                                  dbc + other)
                self.wave_ports[wcfg.index] = wp
                self._wp_trace_bases[wcfg.index] = nd_trace_basis(
                    self.space, wp.trace)

    # -- assembly -----------------------------------------------------------

    def _build_domain(self):
        m = self.materials
        # London superconductors add a lambda_L^-2 mu^-1 value term to the
        # stiffness (reference: spaceoperator.cpp:948-961 / Meissner kinetic
        # inductance, materialoperator.cpp:333-349).
        mls = self.iodata.units.mesh_length_scale
        london = None
        if any(abs(l) > 0 for l in m.london_depth.values()):
            london = {
                a: (m.inv_permeability[a] / (l / mls) ** 2 if abs(l) > 0
                    else 0.0 * m.inv_permeability[a])
                for a, l in m.london_depth.items()
            }
        self.K_dom = nd_operator(self.space, curl_coef=m.inv_permeability,
                                 mass_coef=london)
        lossy = any(np.any(t != 0.0) for t in m.loss_tan.values())
        eps = m.complex_permittivity() if lossy else {
            a: t.astype(complex) for a, t in m.permittivity.items()
        }
        self.M_re = nd_operator(self.space,
                                mass_coef={a: np.real(t) for a, t in eps.items()})
        self.M_im = (
            nd_operator(self.space,
                        mass_coef={a: np.imag(t) for a, t in eps.items()})
            if lossy else None
        )
        has_sigma = any(np.any(t != 0.0) for t in m.conductivity.values())
        self.C_dom = (
            nd_operator(self.space, mass_coef=m.conductivity) if has_sigma else None
        )
        self._build_floquet()

    def _build_floquet(self):
        """Quasi-periodic (Bloch/Floquet) volume terms.  The substitution
        E_phys = E_per exp(-i k.x) turns curl-curl into
        (mu^-1 curl u, curl v) + ((kx)^T mu^-1 kx u, v)
        + i[(mu^-1 kx u, curl v) - (mu^-1 kx curl u, v)]
        (reference: spaceoperator.cpp:1038-1056 Add{Real,Imag}Periodic-
        Coefficients, materialoperator.cpp:351-358,371-446).  With
        FloquetReferenceFrequency, k = k0*omega and the terms scale with
        omega^2 / omega (driven only; materialoperator.cpp:394-427)."""
        self.K_flo_mass = None
        self.K_flo_cross = None
        self.floquet_k: Optional[np.ndarray] = None
        self.floquet_omega_ref = 0.0
        kF_cfg = self.iodata.boundaries.floquet_wave_vector
        if kF_cfg is None or not np.linalg.norm(kF_cfg) > 0:
            return
        sdim = self.mesh.nodes.shape[1]
        if sdim != 3:
            raise NotImplementedError(
                "Floquet wave vector requires a 3D mesh (reference: "
                "materialoperator.cpp:390-392)")
        from palace_tpu.config.schema import ProblemType

        ptype = self.iodata.problem.type
        if ptype not in (ProblemType.DRIVEN, ProblemType.EIGENMODE):
            raise ValueError(
                "Floquet quasi-periodicity is only available for driven or "
                "eigenmode solves (reference: materialoperator.cpp:386-389)")
        from palace_tpu.config import ValueType

        units = self.iodata.units
        k = np.asarray(kF_cfg, float)[:3] * units.mesh_length_scale
        fref = self.iodata.boundaries.floquet_reference_frequency
        wref = (2.0 * math.pi * fref / units.scale_factor(ValueType.FREQUENCY)
                if fref > 0.0 else 0.0)
        if wref > 0.0 and ptype is not ProblemType.DRIVEN:
            raise ValueError("FloquetReferenceFrequency requires Driven")
        if wref == 0.0:
            # BZ wrap to [-pi/L, pi/L] per axis (materialoperator.cpp:406-420).
            bb = self.mesh.nodes.max(axis=0) - self.mesh.nodes.min(axis=0)
            for i in range(3):
                half = math.pi / bb[i] if bb[i] > 0 else math.inf
                if abs(k[i]) > half:
                    k[i] = math.remainder(k[i], 2.0 * half)
        else:
            k = k / wref  # k0 = k_F / omega_ref
        self.floquet_omega_ref = wref
        self.floquet_k = k
        kx = np.array([[0.0, -k[2], k[1]],
                       [k[2], 0.0, -k[0]],
                       [-k[1], k[0], 0.0]])
        m = self.materials
        q_mass = {a: kx.T @ mi @ kx for a, mi in m.inv_permeability.items()}
        q_cross = {a: mi @ kx for a, mi in m.inv_permeability.items()}
        from palace_tpu.fem.nd_operators import nd_cross_operator

        self.K_flo_mass = nd_operator(self.space, mass_coef=q_mass)
        self.K_flo_cross = nd_cross_operator(self.space, q_cross)
        self._flo_mass_csr_cache = None
        self._flo_cross_csr_cache = None

    def floquet_csrs(self):
        """(mass_csr, cross_csr) of the Floquet volume terms (cached)."""
        if self._flo_mass_csr_cache is None:
            self._flo_mass_csr_cache = self._csr(
                self._combine(self.K_flo_mass, []))
            self._flo_cross_csr_cache = self._csr(
                self._combine(self.K_flo_cross, []))
        return self._flo_mass_csr_cache, self._flo_cross_csr_cache

    def floquet_mag_quad(self, x, omega: float, attrs=None) -> float:
        """Extra magnetic-energy quadratic form Re x^H (Fm + i Fc) x from the
        Floquet substitution B = (curl E - i k x E)/(i omega) (reference:
        linalg/floquetcorrection.hpp:28-33 — the |k x E|^2 and cross pieces
        of the B energy).  With FloquetReferenceFrequency, k = k0*omega."""
        if self.K_flo_mass is None:
            return 0.0
        s = omega if self.floquet_omega_ref > 0.0 else 1.0
        x = np.ascontiguousarray(x, complex)
        em = self.K_flo_mass.element_energy(x)
        ec = self.K_flo_cross.element_energy(x)
        tot = 0.0
        for b, e1, e2 in zip(self.mesh.buckets, em, ec):
            v = 2.0 * (s * s * np.real(np.asarray(e1))
                       - s * np.imag(np.asarray(e2)))
            if attrs is not None:
                v = v * np.isin(b.attr, attrs)
            tot += float(np.sum(v))
        return tot

    def _build_boundary(self):
        """Robin boundary buckets for K (1/Ls), C (1/Rs + absorbing invz0),
        M (Cs) (reference: lumpedportoperator.cpp:552-615,
        surfaceimpedanceoperator.cpp:191-240,
        farfieldboundaryoperator.cpp:94-110)."""
        iod, mesh = self.iodata, self.mesh
        self.K_bdr: List[BucketTables] = []
        self.C_bdr: List[BucketTables] = []
        self.M_bdr: List[BucketTables] = []

        def add(target, attrs, coef):
            tr = boundary_trace(mesh, attrs, self.bdr_qorder)
            tb = nd_trace_basis(self.space, tr)
            if np.ndim(coef) == 0:
                c = np.full(len(tr.elem), float(coef))
            else:
                c = coef
            target.append(boundary_mass_bucket(tb, c))

        for port in self.ports.values():
            if not port.active:
                continue
            for elem in port.elems:
                sq = port.to_square(elem)
                if abs(port.R) > 0:
                    add(self.C_bdr, elem.attrs, 1.0 / (port.R * sq))
                if abs(port.L) > 0:
                    add(self.K_bdr, elem.attrs, 1.0 / (port.L * sq))
                if abs(port.C) > 0:
                    add(self.M_bdr, elem.attrs, port.C / sq)

        from palace_tpu.config import ValueType

        units = self.iodata.units
        for imp in iod.boundaries.impedances:
            Rs = imp.Rs / units.scale_factor(ValueType.IMPEDANCE)
            Ls = imp.Ls / units.scale_factor(ValueType.INDUCTANCE)
            Cs = imp.Cs / units.scale_factor(ValueType.CAPACITANCE)
            if abs(Rs) > 0:
                add(self.C_bdr, imp.attributes, 1.0 / Rs)
            if abs(Ls) > 0:
                add(self.K_bdr, imp.attributes, 1.0 / Ls)
            if abs(Cs) > 0:
                add(self.M_bdr, imp.attributes, Cs)

        # Finite-conductivity (skin-depth) boundaries: frequency-dependent
        # surface impedance Z(w) = (1+i)/(sigma delta), delta the skin depth,
        # with the finite-thickness correction; contributes iw/Z times a
        # boundary mass to A2(w) (reference:
        # surfaceconductivityoperator.cpp:148-175).
        self._conductivity: List[tuple] = []
        for cd in iod.boundaries.conductivities:
            sigma = cd.sigma / units.scale_factor(ValueType.CONDUCTIVITY)
            h = cd.h / units.mesh_length_scale
            if cd.external:
                # External surfaces see twice the effective thickness (the
                # BC is applied on one side only).
                h *= 2.0
            tr = boundary_trace(mesh, cd.attributes, self.bdr_qorder)
            tb = nd_trace_basis(self.space, tr)
            bk = boundary_mass_bucket(tb, np.ones(len(tr.elem)))
            self._conductivity.append((bk, sigma, cd.mu_r, h))

        ab = iod.boundaries.absorbing
        self._abc2_tb = None
        if ab is not None and ab.attributes:
            tr = boundary_trace(mesh, ab.attributes, self.bdr_qorder)
            tb = nd_trace_basis(self.space, tr, with_curl=(ab.order > 1))
            if ab.order > 1:
                self._abc2_tb = tb
            # invz0 = sqrt(mu^-1 eps) of the adjacent material
            # (reference: materialoperator.cpp:318-319).
            sdim = mesh.nodes.shape[1]
            invz = {
                a: _matsqrt(self.materials.inv_permeability[a]
                            @ self.materials.permittivity[a])[:sdim, :sdim]
                for a in self.materials.permittivity
            }
            attrs = np.empty(len(tr.elem), np.int32)
            for bi, b in enumerate(mesh.buckets):
                s = tr.bucket == bi
                attrs[s] = b.attr[tr.elem[s]]
            coef = self.materials.attr_tensor(invz, attrs)
            self.C_bdr.append(boundary_mass_bucket(tb, coef))

    # -- operators ----------------------------------------------------------

    def _combine(self, dom: Optional[PAOperator], bdr: List[BucketTables]):
        """List of (gidx, A) table pairs for dom + bdr contributions, with
        orientation signs folded into the element matrices."""
        out = []

        def entry(b):
            A = np.asarray(b.A)
            if b.signs is not None:
                s = np.asarray(b.signs)
                A = A * s[:, :, None] * s[:, None, :]
            return (np.asarray(b.gidx), A)

        if dom is not None:
            for b in dom.buckets:
                out.append(entry(b))
        for b in bdr:
            out.append(entry(b))
        return out

    def _csr(self, tables) -> sp.csr_matrix:
        n = self.space.num_dofs
        rows, cols, vals = [], [], []
        for gidx, A in tables:
            E, nd = gidx.shape
            rows.append(np.repeat(gidx, nd, axis=1).ravel())
            cols.append(np.tile(gidx, (1, nd)).ravel())
            vals.append(A.reshape(E, -1).ravel())
        if not rows:
            return sp.csr_matrix((n, n))
        return sp.coo_matrix(
            (np.concatenate(vals),
             (np.concatenate(rows), np.concatenate(cols))),
            shape=(n, n),
        ).tocsr()

    def aux_bdr_attrs(self) -> list:
        """Boundary attributes whose H1 dofs are held Dirichlet in the
        divergence-free projection's auxiliary space (reference:
        spaceoperator.cpp:193-204, aux_bdr_marker = dbc | farfield |
        surf_sigma | surf_Z Rs/Ls | lumped-port R/L | wave | floquet).

        Gradients of H1 functions constrained on every lossy/port surface
        have zero tangential trace there, so g^H C x = 0 for any damped
        eigenvector x and the projection leaves the quadratic pencil's
        physical spectrum untouched.  With the unconstrained H1 space the
        projection is WRONG for damped problems: g^H (C + lam M) x = 0
        gives the true eigenvectors a genuinely nonzero gradient component
        through the boundary damping (measured 83% M-norm fraction on a
        near-PEC impedance box), and projecting it away corrupts every
        eigenvalue."""
        iod = self.iodata
        attrs = set(iod.boundaries.pec)
        if iod.boundaries.absorbing is not None:
            attrs.update(iod.boundaries.absorbing.attributes)
        for cd in iod.boundaries.conductivities:
            attrs.update(cd.attributes)
        for imp in iod.boundaries.impedances:
            if imp.Rs != 0.0 or imp.Ls != 0.0:
                attrs.update(imp.attributes)
        for lp in iod.boundaries.lumped_ports:
            if any(abs(v) > 0 for v in (lp.R, lp.L, lp.Rs, lp.Ls)):
                for el in lp.elements:
                    attrs.update(el.attributes)
        for wp in iod.boundaries.wave_ports:
            attrs.update(wp.attributes)
        for fp in iod.boundaries.floquet_ports:
            attrs.update(fp.get("Attributes", []))
        return sorted(attrs)

    def stiffness_csr(self) -> sp.csr_matrix:
        K = self._csr(self._combine(self.K_dom, self.K_bdr))
        if self.K_flo_mass is not None and self.floquet_omega_ref == 0.0:
            Fm, Fc = self.floquet_csrs()
            K = (K + Fm + 1j * Fc).tocsr()
        return K

    def damping_csr(self) -> Optional[sp.csr_matrix]:
        t = self._combine(self.C_dom, self.C_bdr)
        return self._csr(t) if t else None

    def mass_csr(self) -> sp.csr_matrix:
        M = self._csr(self._combine(self.M_re, self.M_bdr))
        if self.M_im is not None:
            M = (M + 1j * self._csr(self._combine(self.M_im, []))).tocsr()
        return M

    def system_csr(self, omega: float, K=None, C=None, M=None) -> sp.csr_matrix:
        """A(omega) = K + i omega C - omega^2 M with PEC rows/cols set to
        identity (DIAG_ONE policy, reference: rap.hpp:18-39)."""
        K = self.stiffness_csr() if K is None else K
        C = self.damping_csr() if C is None else C
        M = self.mass_csr() if M is None else M
        A = K.astype(complex) - (omega * omega) * M
        if C is not None:
            A = A + 1j * omega * C
        if self.K_flo_mass is not None and self.floquet_omega_ref > 0.0:
            # Frequency-scaled Floquet terms with k0 = k_F/omega_ref
            # (reference: spaceoperator.cpp:425-427,459-461).
            Fm, Fc = self.floquet_csrs()
            A = A + (omega * omega) * Fm + 1j * omega * Fc
        free = sp.diags((~self.ess_mask).astype(float))
        one = sp.diags(self.ess_mask.astype(float))
        return (free @ A @ free + one).tocsr()

    # -- excitation & measurement -------------------------------------------

    def excitations(self) -> Dict[int, List[int]]:
        """excitation index -> list of driven port indices (reference:
        palace/models/portexcitations.cpp:95-155; surface currents and
        dipoles are always excited and create excitation 1 if none exists)."""
        out: Dict[int, List[int]] = {}
        for idx, port in self.ports.items():
            if port.excitation:
                out.setdefault(port.excitation, []).append(idx)
        for idx, wp in self.wave_ports.items():
            if wp.excitation:
                out.setdefault(wp.excitation, []).append(idx)
        for idx, fp in self.floquet_ports.items():
            if fp.excitation:
                out.setdefault(fp.excitation, []).append(idx)
        if not out and (self.iodata.domains.current_dipoles
                        or self.iodata.boundaries.surface_currents):
            out[1] = []
        return dict(sorted(out.items()))

    # -- wave port coupling (reference: waveportoperator.cpp:1258-1330) ------

    def abc2_a2_csr(self, omega: float) -> Optional[sp.csr_matrix]:
        """Second-order absorbing BC extra term: +i (0.5 (mu^-1 c)_nn / omega)
        (curl_t u, curl_t v) on farfield surfaces (reference:
        farfieldboundaryoperator.cpp:109-140; divergence term omitted as in
        the reference/COMSOL)."""
        if self._abc2_tb is None:
            return None
        from palace_tpu.fem.nd_boundary import boundary_curl_bucket

        tb = self._abc2_tb
        tr = tb.tr
        attrs = np.empty(len(tr.elem), np.int32)
        for bi, b in enumerate(self.mesh.buckets):
            s = tr.bucket == bi
            attrs[s] = b.attr[tr.elem[s]]
        # (mu^-1 c)_nn with c = sqrt((mu eps)^-1): scalar per facet.
        coef = np.empty(len(tr.elem))
        cache = {}
        for k, a in enumerate(attrs):
            a = int(a)
            if a not in cache:
                mi = self.materials.inv_permeability[a]
                eps = self.materials.permittivity[a]
                c = _matsqrt(np.linalg.inv(
                    np.linalg.inv(mi) @ eps))  # sqrt((mu eps)^-1)
                cache[a] = mi @ c
            nbar = tr.normal[k].mean(axis=0)
            coef[k] = float(nbar @ cache[a] @ nbar)
        bk = boundary_curl_bucket(tb, coef)
        A2 = self._csr([(np.asarray(bk.gidx),
                         1j * (0.5 / omega) * np.asarray(bk.A))])
        free = sp.diags((~self.ess_mask).astype(float))
        return (free @ A2 @ free).tocsr()

    def floquet_port_a2_csr(self, omega: float) -> Optional[sp.csr_matrix]:
        """Floquet-port DtN contribution to A2(omega): the full-rank Robin
        term i gamma_00 (mu^-1 u_t, v_t) on the port faces plus the
        low-rank per-order correction sum_k g_k v_k v_k^H (reference:
        floquetportoperator.cpp:980-996 + GetBoundaryOperator :745-770)."""
        if not self.floquet_ports:
            return None
        if not hasattr(self, "_fp_mass_buckets"):
            self._fp_mass_buckets = {}
            for idx, fp in self.floquet_ports.items():
                tb = fp._tb
                tr = tb.tr
                attrs = np.empty(len(tr.elem), np.int32)
                for bi, b in enumerate(self.mesh.buckets):
                    s = tr.bucket == bi
                    attrs[s] = b.attr[tr.elem[s]]
                mi = self.materials.attr_tensor(
                    self.materials.inv_permeability, attrs)
                self._fp_mass_buckets[idx] = boundary_mass_bucket(tb, mi)
        n = self.space.num_dofs
        A = sp.csr_matrix((n, n), dtype=complex)
        free_mask = ~self.ess_mask
        for idx, fp in self.floquet_ports.items():
            fp.initialize(omega)
            bk = self._fp_mass_buckets[idx]
            A = A + 1j * fp.gamma0 * self._csr(
                [(np.asarray(bk.gidx), np.asarray(bk.A))])
        free = sp.diags(free_mask.astype(float))
        return (free @ A @ free).tocsr()

    def floquet_lowrank(self, omega: float):
        """(U, g): F(omega) = U diag(g) U^H with U columns v_k, PEC-masked
        (solved via Woodbury in the driven sweep instead of densifying the
        port-dof block of the sparse matrix).  The rank-1 structure is
        g v v^H — NOT g conj(v) v^T — matching the reference's
        LowRankComplexOperator::AddMult (floquetportoperator.cpp:32-56);
        the two agree at normal incidence (conjugation maps order (m,n) to
        (-m,-n) with equal g) but differ for oblique FloquetWaveVector where
        gamma(m,n) != gamma(-m,-n)."""
        cols, gs = [], []
        free_mask = ~self.ess_mask
        for idx, fp in self.floquet_ports.items():
            fp.initialize(omega)
            for g, v in fp.lowrank_terms(omega):
                cols.append(np.where(free_mask, v, 0.0))
                gs.append(g)
        if not cols:
            return None, None
        return np.stack(cols, axis=1), np.asarray(gs)

    def floquet_rhs2(self, excitation_idx: int, omega: float) -> np.ndarray:
        """Incident plane-wave excitation of the driving Floquet port(s)."""
        rhs = np.zeros(self.space.num_dofs, complex)
        for idx, fp in self.floquet_ports.items():
            if fp.excitation == excitation_idx:
                rhs += fp.excitation_rhs(omega, self.space.num_dofs)
        return np.where(self.ess_mask, 0.0, rhs)

    def floquet_sparams(self, E: np.ndarray, omega: float,
                        excitation_idx: int):
        """{port: {(m, n, is_te): S}} for all Floquet ports."""
        out = {}
        for idx, fp in self.floquet_ports.items():
            out[idx] = fp.s_parameters(
                np.asarray(E), omega,
                subtract_incident=(fp.excitation == excitation_idx))
        return out

    def conductivity_a2_csr(self, omega: float) -> Optional[sp.csr_matrix]:
        """Finite-conductivity surface impedance contribution to A2(w):
        i w / Z(w) boundary mass with Z = (1+i)/(sigma delta),
        delta = sqrt(2/(mu sigma w)), and the finite-thickness factors
        (sinh v +/- sin v)/(cosh v - cos v), v = h/delta (reference:
        surfaceconductivityoperator.cpp:148-175, after the Ansys HFSS
        finite-thickness surface impedance model)."""
        if not self._conductivity:
            return None
        tables = []
        for bk, sigma, mu, h in self._conductivity:
            delta = math.sqrt(2.0 / (mu * sigma * omega))
            zre = zim = 1.0 / (sigma * delta)
            if h > 0.0:
                nu = h / delta
                den = math.cosh(nu) - math.cos(nu)
                zre *= (math.sinh(nu) + math.sin(nu)) / den
                zim *= (math.sinh(nu) - math.sin(nu)) / den
            s = 1j * omega / complex(zre, zim)
            tables.append((np.asarray(bk.gidx), s * np.asarray(bk.A)))
        A2 = self._csr(tables)
        free = sp.diags((~self.ess_mask).astype(float))
        return (free @ A2 @ free).tocsr()

    # -- term-structured system (device solver) ------------------------------

    def driven_terms(self, omegas=None) -> list:
        """The full driven system as constant real matrices with complex
        frequency coefficients, A(omega) = sum_t c_t(omega) X_t — the input
        of the device FGMRES + p-MG stack (linalg/device_ksp.py).  Covers
        exactly the same physics as system_csr + the *_a2_csr extras
        (reference: drivensolver.cpp:176-181 GetExtraSystemOperator)."""
        from palace_tpu.linalg.device_ksp import Term

        shifted = self.iodata.solver.linear.pc_mat_shifted
        terms = [Term("K", self._combine(self.K_dom, self.K_bdr),
                      coef=lambda w: 1.0 + 0.0j)]
        Ct = self._combine(self.C_dom, self.C_bdr)
        if Ct:
            terms.append(Term("C", Ct, coef=lambda w: 1.0j * w))
        if self.K_flo_mass is not None:
            wref = self.floquet_omega_ref
            terms.append(Term(
                "floquet_mass", self._combine(self.K_flo_mass, []),
                coef=(lambda w: w * w + 0.0j) if wref > 0.0
                else (lambda w: 1.0 + 0.0j)))
            terms.append(Term(
                "floquet_cross", self._combine(self.K_flo_cross, []),
                coef=(lambda w: 1.0j * w) if wref > 0.0
                else (lambda w: 1.0j)))
        terms.append(Term("M", self._combine(self.M_re, self.M_bdr),
                          coef=lambda w: -(w * w) + 0.0j,
                          bcoef=(lambda w: w * w + 0.0j) if shifted else None))
        if self.M_im is not None:
            terms.append(Term("M_im", self._combine(self.M_im, []),
                              coef=lambda w: -1.0j * (w * w)))
        for idx, wp in self.wave_ports.items():
            if not wp.active:
                continue
            tb = self._wp_trace_bases[idx]
            bk = self._waveport_mass_bucket(idx, tb)
            kn_re = (lambda w, _wp=wp: float(_wp.solve_mode(w).kn.real))
            terms.append(Term(f"waveport{idx}",
                              self._combine(None, [bk]),
                              coef=lambda w, f=kn_re: 1.0j * f(w)))
        for si, (bk, sigma, mu, h) in enumerate(self._conductivity):
            def c_cond(w, sigma=sigma, mu=mu, h=h):
                delta = math.sqrt(2.0 / (mu * sigma * w))
                zre = zim = 1.0 / (sigma * delta)
                if h > 0.0:
                    nu = h / delta
                    den = math.cosh(nu) - math.cos(nu)
                    zre *= (math.sinh(nu) + math.sin(nu)) / den
                    zim *= (math.sinh(nu) - math.sin(nu)) / den
                return 1.0j * w / complex(zre, zim)

            terms.append(Term(f"conductivity{si}",
                              self._combine(None, [bk]), coef=c_cond))
        if self._abc2_tb is not None:
            bk = self._abc2_curl_bucket()
            terms.append(Term("abc2", self._combine(None, [bk]),
                              coef=lambda w: 1.0j * 0.5 / w))
        return terms

    def _waveport_mass_bucket(self, idx: int, tb):
        """mu^-1 boundary mass on the wave-port surface (frequency
        independent; the i*kn(omega) scale lives in the term coefficient)."""
        from palace_tpu.fem.nd_boundary import boundary_mass_bucket

        tr = tb.tr
        attrs = np.empty(len(tr.elem), np.int32)
        for bi, b in enumerate(self.mesh.buckets):
            s = tr.bucket == bi
            attrs[s] = b.attr[tr.elem[s]]
        muinv = self.materials.attr_tensor(self.materials.inv_permeability,
                                           attrs)
        return boundary_mass_bucket(tb, muinv)

    def _abc2_curl_bucket(self):
        """(mu^-1 c)_nn-weighted tangential-curl bucket for the 2nd-order
        absorbing BC (the 1/omega scale lives in the term coefficient)."""
        from palace_tpu.fem.nd_boundary import boundary_curl_bucket

        tb = self._abc2_tb
        tr = tb.tr
        attrs = np.empty(len(tr.elem), np.int32)
        for bi, b in enumerate(self.mesh.buckets):
            s = tr.bucket == bi
            attrs[s] = b.attr[tr.elem[s]]
        coef = np.empty(len(tr.elem))
        cache = {}
        for k, a in enumerate(attrs):
            a = int(a)
            if a not in cache:
                mi = self.materials.inv_permeability[a]
                eps = self.materials.permittivity[a]
                c = _matsqrt(np.linalg.inv(np.linalg.inv(mi) @ eps))
                cache[a] = mi @ c
            nbar = tr.normal[k].mean(axis=0)
            coef[k] = float(nbar @ cache[a] @ nbar)
        return boundary_curl_bucket(tb, coef)

    def waveport_a2_csr(self, omega: float) -> Optional[sp.csr_matrix]:
        """A2(omega) = sum_ports i kn_re (mu^-1 u_t, v_t) on port surfaces."""
        if not self.wave_ports:
            return None
        from palace_tpu.fem.nd_boundary import boundary_mass_bucket

        tables = []
        for idx, wp in self.wave_ports.items():
            if not wp.active:
                continue
            sol = wp.solve_mode(omega)
            tb = self._wp_trace_bases[idx]
            tr = tb.tr
            attrs = np.empty(len(tr.elem), np.int32)
            for bi, b in enumerate(self.mesh.buckets):
                s = tr.bucket == bi
                attrs[s] = b.attr[tr.elem[s]]
            muinv = self.materials.attr_tensor(self.materials.inv_permeability,
                                               attrs)
            bk = boundary_mass_bucket(tb, muinv)
            bk.A = 1j * sol.kn.real * bk.A
            tables.append((np.asarray(bk.gidx), np.asarray(bk.A)))
        if not tables:
            return None
        A2 = self._csr(tables).astype(complex)
        free = sp.diags((~self.ess_mask).astype(float))
        return (free @ A2 @ free).tocsr()

    def waveport_rhs2(self, excitation_idx: int, omega: float) -> np.ndarray:
        """RHS2 = -U_inc = 2 (-i omega) n x H_inc from the modal fields."""
        from palace_tpu.fem.nd_boundary import boundary_rhs

        out = np.zeros(self.space.num_dofs, complex)
        for idx, wp in self.wave_ports.items():
            if wp.excitation != excitation_idx:
                continue
            sol = wp.solve_mode(omega)
            s_field = wp.nxh_field(sol, omega)
            tb = self._wp_trace_bases[idx]
            out += boundary_rhs(tb, 2.0 * omega * np.imag(s_field),
                                self.space.num_dofs)
            out += 1j * boundary_rhs(tb, -2.0 * omega * np.real(s_field),
                                     self.space.num_dofs)
        out[self.ess_mask] = 0.0
        return out

    def waveport_sparam(self, idx: int, E: np.ndarray, omega: float) -> complex:
        """Modal overlap S = -∫ conj(s_field) . E dS
        (reference: waveportoperator.cpp:832-850)."""
        from palace_tpu.fem.nd_boundary import boundary_rhs

        wp = self.wave_ports[idx]
        sol = wp.solve_mode(omega)
        s_field = wp.nxh_field(sol, omega)
        tb = self._wp_trace_bases[idx]
        sv = boundary_rhs(tb, np.conj(s_field), self.space.num_dofs)
        return complex(-np.dot(sv, E))

    def rhs1(self, excitation_idx: int) -> np.ndarray:
        """Real excitation vector -U_inc = 2 Hinc E_inc (reference:
        lumpedportoperator.cpp:618-640); the i*omega factor is applied by
        the driven sweep, g'(t) by the transient solver."""
        out = np.zeros(self.space.num_dofs)
        for idx, port in self.ports.items():
            if port.excitation != excitation_idx:
                continue
            for elem, tb in zip(port.elems, self._port_trace_bases[idx]):
                Rs = port.R * port.to_square(elem)
                Hinc = 1.0 / math.sqrt(Rs * elem.w * elem.l * len(port.elems))
                f = elem.mode_field(tb.tr.xq, 2.0 * Hinc)
                out += boundary_rhs(tb, f, self.space.num_dofs)
        # Surface currents (always excited, unit current split across
        # elements; reference: surfacecurrentoperator.cpp:AddExcitation...).
        for sc, elems, tbs in self._surface_currents:
            ne = len(elems)
            for elem, tb in zip(elems, tbs):
                f = elem.mode_field(tb.tr.xq, -1.0 / (elem.w * ne))
                out += boundary_rhs(tb, f, self.space.num_dofs)
        # Point current dipoles: rhs_n = -moment d . v_n(x0) (reference:
        # currentdipoleoperator.cpp AddExcitationDomainIntegrators, RHS =
        # -i omega J_e with J_e = moment delta(x - x0) d; dipoles drive every
        # excitation, portexcitations.cpp:142-155).
        for dp in self.iodata.domains.current_dipoles:
            from palace_tpu.fem import evaluation

            x0 = np.asarray(dp.center, float) / self.iodata.units.mesh_length_scale
            loc = evaluation.PointLocator(self.mesh).locate(x0[None, :])[0]
            b = self.mesh.buckets[loc.bucket]
            xi = loc.xi[None, :]
            V, _ = self.space.basis_tables(b.geom, xi)
            import palace_tpu.fem.reference as refmod
            gb = refmod.gmsh_geometry_basis(b.etype)
            X = self.mesh.nodes[b.conn[loc.elem]]
            J = X.T @ gb.eval_grad(xi)[0]
            vphys = np.linalg.inv(J).T @ V[0].T  # (sdim, nd)
            d = np.asarray(dp.direction, float)
            d = d / np.linalg.norm(d)
            from palace_tpu.config import ValueType as VT
            u = self.iodata.units
            moment = dp.moment / (u.scale_factor(VT.CURRENT)
                                  * u.scale_factor(VT.LENGTH))
            contrib = -moment * (d @ vphys)
            sg = getattr(self.space, "elem_signs", None)
            if sg is not None and sg[loc.bucket] is not None:
                contrib = contrib * sg[loc.bucket][loc.elem]
            np.add.at(out, self.space.elem_dofs[loc.bucket][loc.elem], contrib)
        out[self.ess_mask] = 0.0
        return out

    def lumped_port_primary_et(self, idx: int) -> np.ndarray:
        """Tangential port-mode field E_t with unity-Z_R normalization,
        L2-projected onto the ND trace space via a port-boundary mass solve
        (reference: spaceoperator.cpp:1083-1111
        GetLumpedPortExcitationVectorPrimaryEt; DOF interpolation instead of
        the mass solve would break the |e_t| normalization the PROM circuit
        synthesis relies on, romoperator.cpp:624-675)."""
        from scipy.sparse.linalg import splu as _splu

        port = self.ports[idx]
        tbs = self._port_trace_bases[idx]
        b = np.zeros(self.space.num_dofs)
        rows, cols, vals = [], [], []
        for elem, tb in zip(port.elems, tbs):
            Rs = 1.0 * port.to_square(elem)  # unity reference impedance
            Einc = math.sqrt(Rs / (elem.w * elem.l * len(port.elems)))
            f = elem.mode_field(tb.tr.xq, Einc)
            b += boundary_rhs(tb, f, self.space.num_dofs, tangential=True)
            A = np.einsum("fq,fqns,fqms->fnm", tb.tr.wdetJ, tb.Vt, tb.Vt,
                          optimize=True)
            n = tb.dofs.shape[1]
            rows.append(np.repeat(tb.dofs, n, axis=1).ravel())
            cols.append(np.tile(tb.dofs, (1, n)).ravel())
            vals.append(A.ravel())
        M = sp.coo_matrix(
            (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
            shape=(self.space.num_dofs,) * 2).tocsr()
        # Restrict the (otherwise singular) trace mass to dofs with
        # tangential support on the port surface.
        diag = M.diagonal()
        support = np.where(diag > 1e-12 * diag.max())[0]
        et = np.zeros(self.space.num_dofs)
        et[support] = _splu(M[support][:, support].tocsc()).solve(b[support])
        et[self.ess_mask] = 0.0  # zero_metal
        return et

    def port_functionals(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """(s, v): S-parameter and voltage measurement vectors for port idx
        (reference: lumpedportoperator.cpp:163-221)."""
        port = self.ports[idx]
        s = np.zeros(self.space.num_dofs)
        v = np.zeros(self.space.num_dofs)
        for elem, tb in zip(port.elems, self._port_trace_bases[idx]):
            Rs = port.R * port.to_square(elem)
            Hinc = (1.0 / math.sqrt(Rs * elem.w * elem.l * len(port.elems))
                    if abs(Rs) > 0 else 0.0)
            s += boundary_rhs(tb, elem.mode_field(tb.tr.xq, Hinc),
                              self.space.num_dofs)
            v += boundary_rhs(
                tb, elem.mode_field(tb.tr.xq, 1.0 / (elem.w * len(port.elems))),
                self.space.num_dofs,
            )
        return s, v

    def port_power(self, idx: int, E: np.ndarray, omega: float) -> complex:
        """P = ∫ (E x conj(H)) . n dS with H = mu^-1 B, B = -curl E / (i omega),
        +n the direction of propagation into the domain (reference:
        lumpedportoperator.cpp:224-283)."""
        P = 0.0 + 0.0j
        for tb in self._port_trace_bases[idx]:
            P += self.port_power_trace(tb, E, omega)
        return complex(P)

    def port_power_trace(self, tb, E: np.ndarray, omega: float) -> complex:
        from palace_tpu.fem.evaluation import trace_nd

        P = 0.0 + 0.0j
        for tb in (tb,):
            tr = tb.tr
            attrs = np.empty(len(tr.elem), np.int32)
            for bi, b in enumerate(self.mesh.buckets):
                ssel = tr.bucket == bi
                attrs[ssel] = b.attr[tr.elem[ssel]]
            muinv = self.materials.attr_tensor(self.materials.inv_permeability,
                                               attrs)
            Ev = trace_nd(self.space, E, tr, which="value")  # (n, nq, sdim)
            Bv = trace_nd(self.space, E, tr, which="curl") * (-1.0 / (1j * omega))
            if self.mesh.nodes.shape[1] == 2:
                # 2D: H = (mu^-1)_zz B_z out of plane; (E x H z) = (Ey H, -Ex H).
                H = muinv[:, 2, 2][:, None] * Bv[..., 0]
                ExH = np.stack([Ev[..., 1] * np.conj(H),
                                -Ev[..., 0] * np.conj(H)], axis=-1)
            else:
                H = np.einsum("fst,fqt->fqs", muinv, Bv)
                ExH = np.cross(Ev, np.conj(H))
            # Trace normals are outward from the domain; propagation is inward.
            P += np.einsum("fq,fqs,fqs->", tr.wdetJ, ExH, -tr.normal)
        return complex(P)
