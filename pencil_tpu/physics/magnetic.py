"""Induction equation for the vector potential A (reference
``src/magnetic.f90``, ``daa_dt`` at :4229-5589):

    ∂A/∂t = u×B + η ∇²A  (+ η₃ hyperresistivity)    (resistive gauge,
                                                     the reference default
                                                     lweyl_gauge=F,
                                                     magnetic.f90:319,4394)
or, with lweyl_gauge=True, −ηµ₀J instead of η∇²A.

Evolving A keeps ∇·B = 0 to machine precision (reference magnetic.f90:4229
comment).  µ₀ = 1 code units.  The Lorentz force (J×B)/ρ is added to the
momentum equation and the Ohmic heating ηµ₀J² published for entropy."""
from __future__ import annotations

from dataclasses import dataclass
from typing import ClassVar, Tuple

import jax.numpy as jnp

from .base import ModuleBase, accumulate


@dataclass(frozen=True)
class Magnetic(ModuleBase):
    name: ClassVar[str] = "magnetic"

    eta: float = 0.0
    eta_hyper3: float = 0.0
    eta_shock: float = 0.0
    # Biermann battery: dA/dt −= battery_term·f_pres (magnetic.f90:5329-5337)
    battery_term: float = 0.0
    # Hall effect: dA/dt −= hall_term·J×B (magnetic.f90:5310-5318) with
    # the whistler advection CFL Σ|u − hall·J|·dline
    hall_term: float = 0.0
    # mean-field closure (reference src/magnetic/meanfield.f90): adds the
    # parameterized EMF  E = α·B − η_t µ0 J  to the induction equation
    meanfield_alpha: float = 0.0
    meanfield_etat: float = 0.0
    # MAGNETIC_MEANFIELD_DEMFDT sub-slot (src/magnetic/meanfield_demfdt.f90):
    # the EMF becomes a PDE field obeying a telegraph-type relaxation
    # dEMF/dt = τ⁻¹·kf^1.5·(mf_EMF − EMF) + η_emf∇²EMF, and dA/dt += EMF
    # instead of the instantaneous mf_EMF (demf_dt_meanfield :206-260)
    lmagn_mf_demfdt: bool = False
    tau_emf: float = 0.0
    tau1_emf: float = 0.0
    eta_emf_over_etat: float = 0.0
    meanfield_kf: float = 1.0
    # mean-field Omega effect (meanfield.f90 Omega_profile/Omega_ampl)
    omega_profile: str = "nothing"
    omega_ampl: float = 0.0
    lweyl_gauge: bool = False   # η_t term as −η_t µ0 J instead of η_t∇²A
    # operator-split implicit η∇²A over the full step (magnetic.f90:10335
    # split_update_magnetic → ImplicitDiffusion integrate_diffusion; the
    # explicit η term and its CFL are both skipped, :4395 exp_const)
    limplicit_resistivity: bool = False
    # advective (Λ-)gauge: dA/dt = −(u·∇)A − A_j∇u_j instead of u×B
    # (magnetic.f90:5158-5212; the FARGO variant drops the irrotational
    # term, Candelaresi et al. 2011)
    ladvective_gauge: bool = False
    B_ext: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    llorentzforce: bool = True
    lohmic_heat: bool = True
    init: str = "zero"
    init_list_pars: tuple = ()  # per-entry overrides for list inits
    ampl: float = 0.0
    kx: float = 1.0
    ky: float = 1.0
    kz: float = 1.0
    relhel_aa: float = 1.0     # fractional helicity of Beltrami inits
    rnoise_int: float = 0.0    # radial band for 'gaussian-noise-rprof'
    rnoise_ext: float = 0.0
    radius: float = 1.0        # flux-tube inits ('hor-tube-x' etc.)
    epsilonaa: float = 0.0
    center1: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    # 'piecewise-dipole' shell radii + inclination (magnetic.f90:8618)
    r_int: float = 0.0
    r_ext: float = 1.0
    inclaa: float = 0.0
    lrelativistic_eos: bool = False
    # semirelativistic Boris correction (Gombosi et al. 2002 Eq. 34;
    # magnetic.f90:3494-3554 lboris_correction): reduced speed of light
    # c² = va2max_boris caps the effective Alfvén speed
    lboris_correction: bool = False
    va2max_boris: float = 0.0
    # z-dependent resistivity (iresistivity='zdep', eta_zdep :8846-9010);
    # only the 'cubic_step' profile is implemented:
    # η(z) = η·(1 + (η_jump−1)·cubic_step(z, η_z0, −η_zwidth))
    zdep_profile: str = ""
    eta_z0: float = 1.0
    eta_zwidth: float = 0.0
    eta_jump: float = 0.0
    # shell resistivity (iresistivity='shell', magnetic.f90:6946-7014
    # eta_shell): η steps up to eta_int inside r_int and eta_ext outside
    # r_ext, with the gradient term geta·∇·A
    lresi_shell: bool = False
    eta_int: float = 0.0
    eta_ext: float = 0.0
    wresistivity: float = 0.01
    # initaa='magnetogram' potential-field extrapolation inputs
    magnetogram_file: str = ""
    unit_magnetic: float = 1.0
    # µ₀ in code units (cdata: µ0_unit_sys·ρ_u·u_u²/B_u²; 1 for the
    # consistent default unit_magnetic)
    mu0: float = 1.0

    def split_update(self, fa, model, grid, dt):
        """Implicit η∇²A over the full step (split_update_magnetic,
        magnetic.f90:10335-10350 → integrate_diffusion 'full')."""
        if not (self.limplicit_resistivity and self.eta > 0.0):
            return fa
        from ..integrate.implicit import integrate_diffusion_full
        sl = model.reg.slice("aa")
        aa = integrate_diffusion_full(fa[sl], self.eta, dt, grid,
                                      model.cfg.grid)
        return fa.at[sl].set(aa)

    def register(self, reg):
        reg.register("aa", 3, "pde", comps=("ax", "ay", "az"))
        if self.lmagn_mf_demfdt:
            # meanfield_demfdt.f90:72 farray_register_pde('emf',vector=3)
            reg.register("emf", 3, "pde", comps=("emfx", "emfy", "emfz"))

    def _advective_gauge(self, pen):
        """Induction in the advective gauge (magnetic.f90:5156-5212)."""
        uu = pen.uu()
        aa = pen.field("aa")
        coords = pen.cfg.grid.coords
        inv_r = None
        if coords != "cartesian":
            from .curvilinear import metric
            inv_r = metric(pen)["inv_r"]
        daj = [pen.d("aa", j) for j in range(3)]   # daj[j][k] = ∂ⱼa_k
        fargo = pen._cache.get("_fargo_mean") is not None
        if fargo:
            # dA/dt = −(u'·∇)A + (∇A)ᵀ·u  (no irrotational term)
            uadv = pen.uu_advec()
            gaa = jnp.stack([sum(uadv[k] * daj[k][j] for k in range(3))
                             for j in range(3)])
            ajiuj = jnp.stack([sum(uu[k] * daj[j][k] for k in range(3))
                               for j in range(3)])
            if coords == "cylindrical":
                gaa = gaa.at[0].add(-uu[1] * aa[1] * inv_r)
                gaa = gaa.at[1].add(uu[1] * aa[0] * inv_r)
                ajiuj = ajiuj.at[1].add(
                    (aa[0] * uu[1] - aa[1] * uu[0]) * inv_r)
            return -gaa + ajiuj
        uij = pen.uij()
        uga = jnp.stack([sum(uu[k] * daj[k][j] for k in range(3))
                         for j in range(3)])
        if any(b != 0.0 for b in self.B_ext):
            be = jnp.asarray(self.B_ext, uu.dtype)
            ujiaj = jnp.stack([uu[1] * be[2] - uu[2] * be[1],
                               uu[2] * be[0] - uu[0] * be[2],
                               uu[0] * be[1] - uu[1] * be[0]])
        else:
            ujiaj = jnp.zeros_like(uu)
        ujiaj = ujiaj + jnp.stack([
            sum(aa[k] * uij[k, j] for k in range(3)) for j in range(3)])
        if coords == "cylindrical":
            uga = uga.at[0].add(-uu[1] * aa[1] * inv_r)
            uga = uga.at[1].add(uu[1] * aa[0] * inv_r)
            ujiaj = ujiaj.at[1].add(
                (uu[0] * aa[1] - uu[1] * aa[0]) * inv_r)
        elif coords == "spherical":
            from .curvilinear import metric
            cot_r = metric(pen)["cot_r"]    # cotθ/r
            # h_dot_grad vector curvature terms (sub.f90 h_dot_grad_vec)
            uga = uga.at[0].add(-(uu[1] * aa[1] + uu[2] * aa[2]) * inv_r)
            uga = uga.at[1].add(uu[1] * aa[0] * inv_r
                                - uu[2] * aa[2] * cot_r)
            uga = uga.at[2].add(uu[2] * aa[0] * inv_r
                                + uu[2] * aa[1] * cot_r)
            # reference spherical ujiaj (magnetic.f90:5195-5201)
            ujiaj = ujiaj.at[1].add(
                (uu[0] * aa[1] - uu[1] * aa[0]) * inv_r)
            ujiaj = ujiaj.at[2].add(
                (uu[0] * aa[2] - uu[2] * aa[0]) * inv_r
                + (uu[1] * aa[2] - uu[2] * aa[2]) * cot_r)
        return -uga - ujiaj

    def rhs(self, pen, df, ts):
        if self.ladvective_gauge and "uu" in pen.reg.slots:
            out = self._advective_gauge(pen)
        else:
            out = pen.uxb()
        if self.zdep_profile:
            # η(z) profile + gradient term on the z-component
            # (magnetic.f90:4438-4453: fres_z += ∂_zη·∇·A); profiles
            # 'cubic_step' and tanh 'step' (eta_zdep :8846-8905)
            zg = pen.grid.zg
            w = -self.eta_zwidth
            if self.zdep_profile == "cubic_step":
                x = jnp.clip((zg - self.eta_z0) / w, -1.0, 1.0)
                cstep = 0.5 + 0.75 * x - 0.25 * x ** 3
                eta_z = self.eta * (1.0 + (self.eta_jump - 1.0) * cstep)
                geta_z = (self.eta * (self.eta_jump - 1.0)
                          * (0.75 - 0.75 * x ** 2) / w)
            elif self.zdep_profile == "step":
                x = (zg - self.eta_z0) / w
                eta_z = self.eta * (1.0 + (self.eta_jump - 1.0)
                                    * 0.5 * (1.0 + jnp.tanh(x)))
                geta_z = (self.eta * (self.eta_jump - 1.0)
                          * 0.5 / (w * jnp.cosh(jnp.clip(x, -20, 20))
                                   ** 2))
            else:
                raise NotImplementedError(
                    f"zdep_profile={self.zdep_profile!r}")
            out = out + eta_z[None] * pen.del2a()
            out = out.at[2].add(geta_z * pen.diva())
            ts.diffus(eta_z)
        elif self.eta > 0.0 and not self.lresi_shell \
                and not self.limplicit_resistivity:
            if self.lweyl_gauge:
                # Weyl gauge: −ηµ0J = −η(∇(∇·A) − ∇²A); pen.jj metric-aware
                out = out - self.eta * self.mu0 * pen.jj()
            else:
                # resistive gauge η∇²A — the reference default
                # (magnetic.f90:4399)
                out = out + self.eta * pen.del2a()
            ts.diffus(self.eta)
        if self.lresi_shell:
            # fres += η(r)∇²A + ∇η·(∇·A)  (magnetic.f90:4650-4656)
            g = pen.grid
            gs = pen.cfg.grid
            zero = jnp.zeros((gs.nx, gs.ny, gs.nz), g.z.dtype)
            if gs.coords == "spherical":
                r = g.xg + zero
                evr = jnp.stack([1.0 + zero, zero, zero])
            elif gs.coords == "cylindrical":
                r = g.xg + zero
                evr = jnp.stack([1.0 + zero, zero, zero])
            else:
                r = jnp.sqrt(g.xg ** 2 + g.yg ** 2 + g.zg ** 2) + zero
                rs = jnp.maximum(r, 1e-30)
                evr = jnp.stack([g.xg / rs + zero, g.yg / rs + zero,
                                 g.zg / rs + zero])
            w = max(self.wresistivity, 1e-30)
            d_int = max(self.eta_int - self.eta, 0.0) \
                if self.eta_int > 0.0 else 0.0
            d_ext = max(self.eta_ext - self.eta, 0.0) \
                if self.eta_ext > 0.0 else 0.0
            s_int = 0.5 * (1.0 + jnp.tanh((r - self.r_int) / w))
            s_ext = 0.5 * (1.0 + jnp.tanh((r - self.r_ext) / w))
            eta_mn = self.eta + d_int * (1.0 - s_int) + d_ext * s_ext
            eta_r = (-d_int * 0.5 / w * (1.0 - jnp.tanh(
                (r - self.r_int) / w) ** 2)
                + d_ext * 0.5 / w * (1.0 - jnp.tanh(
                    (r - self.r_ext) / w) ** 2))
            out = out + eta_mn[None] * pen.del2a() \
                + evr * (eta_r * pen.diva())[None]
            ts.diffus(eta_mn)
        if self.eta_hyper3 > 0.0:
            out = out + self.eta_hyper3 * pen.del6v_scaled("aa")
            ts.diffus3(self.eta_hyper3)
        if self.eta_shock > 0.0 and "shock" in pen.reg.slots:
            shock = pen.field("shock")
            out = out - self.eta_shock * self.mu0 * shock[None] * pen.jj()
            ts.diffus(self.eta_shock * shock)
        mf_emf = None
        if self.meanfield_alpha != 0.0 or "alpm" in pen.reg.slots:
            # dynamical quenching: the magnetic alpha evolved by the
            # meanfield_alpm special adds to the kinetic alpha
            # (special/meanfield_alpm.f90; meanfield.f90 alpha_total)
            alp = self.meanfield_alpha
            if "alpm" in pen.reg.slots:
                alp = alp + pen.field("alpm")
            mf_emf = alp * pen.bb()
        if self.meanfield_etat > 0.0:
            # resistive-gauge turbulent diffusion η_t∇²A — the reference
            # default; lweyl_gauge uses −η_t µ0 J (meanfield.f90:1276)
            if self.lweyl_gauge:
                term = -self.meanfield_etat * self.mu0 * pen.jj()
            else:
                term = self.meanfield_etat * pen.del2a()
            mf_emf = term if mf_emf is None else mf_emf + term
            ts.diffus(self.meanfield_etat)
        if mf_emf is not None:
            if self.lmagn_mf_demfdt:
                # telegraph closure (meanfield_demfdt.f90:226-260):
                # dEMF/dt = τ₁·kf^1.5·(mf_EMF − EMF) [+ η_emf ∇²EMF],
                # and the *evolved* EMF drives dA/dt
                emf = pen.field("emf")
                tau1 = (1.0 / self.tau_emf if self.tau_emf != 0.0
                        else self.tau1_emf) * self.meanfield_kf ** 1.5
                demf = tau1 * (mf_emf - emf)
                if self.eta_emf_over_etat != 0.0:
                    eta_emf = self.meanfield_etat * self.eta_emf_over_etat
                    demf = demf + eta_emf * pen.del2v("emf")
                    ts.diffus(eta_emf)
                accumulate(df, "emf", demf)
                out = out + emf
            else:
                out = out + mf_emf
        if self.omega_ampl != 0.0 and self.omega_profile != "nothing":
            # mean-field Omega effect — shear written directly on A
            # (meanfield.f90:1601-1648 Omega_effect)
            aa = pen.field("aa")
            g = pen.grid
            zero = jnp.zeros_like(aa[0])
            if self.omega_profile == "(0,Sx,0)":
                out = out + jnp.stack(
                    [-self.omega_ampl * aa[1], zero, zero])
            elif self.omega_profile == "(0,0,Sx)":
                out = out + jnp.stack(
                    [-self.omega_ampl * aa[2], zero, zero])
            elif self.omega_profile == "(Sz,0,0)":
                out = out + jnp.stack(
                    [zero, zero, -self.omega_ampl * aa[0]])
                if "uu" in pen.reg.slots:
                    uu = pen.uu()
                    accumulate(df, "uu", jnp.stack(
                        [-self.omega_ampl * uu[2], zero, zero]))
            elif self.omega_profile == "(0,cosx*cosz,0)":
                sx, cx = jnp.sin(g.xg), jnp.cos(g.xg)
                sz, cz = jnp.sin(g.zg), jnp.cos(g.zg)
                out = out + self.omega_ampl * jnp.stack(
                    [aa[1] * sx * cz, zero, aa[1] * cx * sz])
            else:
                raise NotImplementedError(
                    f"Omega_profile={self.omega_profile!r}")
        if self.battery_term != 0.0:
            out = out - self.battery_term * pen.fpres()
        if self.hall_term != 0.0:
            out = out - self.hall_term * self.mu0 * pen.jxb()
            if "uu" in pen.reg.slots:
                uu = pen.uu()
                jj = pen.jj()
                d1 = pen.dline_1()
                ts.advec(sum(jnp.abs(uu[a] - self.hall_term * jj[a])
                             * d1[a] for a in range(3)))
        accumulate(df, "aa", out)

        if "uu" in pen.reg.slots:
            # anisotropic Alfvén CFL: advec_va2 = Σ(B_i·dline_1_i)²/(µ0ρ)
            # (reference magnetic.f90:5438) — waves along degenerate axes
            # impose no constraint
            bb = pen.bb()
            d1 = pen.dline_1()
            adv_va2 = sum((bb[a] * d1[a]) ** 2 for a in range(3)) \
                * pen.rho1()
            if self.lboris_correction and self.va2max_boris > 0:
                # Boris reduction of the Alfvén CFL (magnetic.f90:5431-5438)
                adv_va2 = adv_va2 * (1.0 + (pen.va2()
                                            / self.va2max_boris) ** 2) ** -0.5
            ts.advec2(adv_va2)

        if self.llorentzforce and "uu" in pen.reg.slots:
            if self.lrelativistic_eos:
                # p=ρ/3 ultrarelativistic fluid (magnetic.f90:4348-4352):
                # du += (3/4)J×B/ρ and dlnρ += u·(J×B/ρ)
                jxbr = pen.jxbr()
                accumulate(df, "uu", 0.75 * jxbr)
                if "lnrho" in pen.reg.slots:
                    uu = pen.uu()
                    accumulate(df, "lnrho",
                               sum(uu[a] * jxbr[a] for a in range(3)))
            elif self.lboris_correction and self.va2max_boris > 0:
                # semirelativistic momentum equation (magnetic.f90
                # :3498-3530): du += γ_A²·J×B/ρ + (1−γ_A²)·Q −
                # γ_A⁴·(ρc²)⁻¹·B(B·Q) with Q = u·∇u + ∇p/ρ − g and
                # γ_A² = c²/(c²+v_A²); works with constant gravity only
                # (upstream restriction)
                va2 = pen.va2()
                cl2 = self.va2max_boris
                gA2 = cl2 / (cl2 + va2 + 1e-30)
                Q = pen.ugu() - pen.fpres()
                grav = pen.cfg.module("gravity")
                if grav is not None and getattr(grav, "gravz", 0.0) != 0.0:
                    Q = Q.at[2].add(-grav.gravz)
                bb = pen.bb()
                bQ = sum(bb[a] * Q[a] for a in range(3))
                accumulate(df, "uu",
                           gA2[None] * pen.jxbr() + (1.0 - gA2)[None] * Q
                           - (gA2 ** 2 * pen.rho1() / cl2)[None] * bb
                           * bQ[None])
            else:
                accumulate(df, "uu", pen.jxbr())
        if self.lohmic_heat and self.eta > 0.0 and "ss" in pen.reg.slots:
            # η µ0 J² (reference entropy coupling uses etatotal·mu0·j2)
            pen._cache["ohmic_heat"] = self.eta * self.mu0 * pen.j2()

    def _magnetogram(self, grid, spec):
        """Potential-field extrapolation of an observed Bz magnetogram
        (initcond.f90:6321-6442 mag_init + fourier_fftpack.f90:3632-3690
        setup_extrapol_fact, :3824-3960 field_extrapol_z_parallel):
        Ãx = i·ky·B̃z·e^{|k|Δz}/k², Ãy = −i·kx·B̃z·e^{|k|Δz}/k², Az = 0,
        with Δz = z0 − z (sub-photospheric enhancement reduced ×0.25)
        and the file holding nxgrid×nygrid float64 Gauss values."""
        import numpy as np
        Bz = np.fromfile(self.magnetogram_file, "<f8")
        nx, ny = spec.nx, spec.ny
        if Bz.size < nx * ny:
            raise ValueError(
                f"magnetogram {self.magnetogram_file}: {Bz.size} values "
                f"for a {nx}x{ny} grid")
        # the file may hold several time frames (lmag_time_bound driver);
        # mag_init reads frame 1 (initcond.f90:6370-6382)
        Bz = Bz[:nx * ny].reshape(ny, nx).T * 1e-4 / self.unit_magnetic
        kx = 2 * np.pi * np.fft.fftfreq(nx, d=spec.Lx / nx)
        ky = 2 * np.pi * np.fft.fftfreq(ny, d=spec.Ly / ny)
        k2 = kx[:, None] ** 2 + ky[None, :] ** 2
        k2[0, 0] = 1.0
        kk = np.sqrt(k2)
        Bzk = np.fft.fft2(Bz)
        ng = spec.nghost
        z = np.asarray(grid.z, np.float64)[ng:-ng]
        dz_ = spec.z0 - z
        dz_ = np.where(dz_ > 0.0, 0.25 * dz_, dz_)     # reduce_factor
        fact = np.exp(kk[:, :, None] * dz_[None, None, :]) \
            / k2[:, :, None]
        Axk = 1j * ky[None, :, None] * Bzk[:, :, None] * fact
        Ayk = -1j * kx[:, None, None] * Bzk[:, :, None] * fact
        Ax = np.real(np.fft.ifft2(Axk, axes=(0, 1)))
        Ay = np.real(np.fft.ifft2(Ayk, axes=(0, 1)))
        zero = np.zeros_like(Ax)
        return {"aa": jnp.asarray(np.stack([Ax, Ay, zero]))}

    def init_fields(self, grid, spec, eos, key, cfg=None):
        from .initcond import init_vector
        if self.init == "magnetogram":
            return self._magnetogram(grid, spec)
        if isinstance(self.init, (list, tuple)):
            # ninit cascade — each entry ADDS (magnetic.f90 init loop)
            import dataclasses

            import jax
            out = {}
            for i, nm in enumerate(self.init):
                key, sub = jax.random.split(key)
                over = dict(self.init_list_pars[i]) \
                    if i < len(self.init_list_pars) else {}
                d = dataclasses.replace(
                    self, init=str(nm), init_list_pars=(), **over) \
                    .init_fields(grid, spec, eos, sub, cfg)
                for k, v in d.items():
                    out[k] = out.get(k, 0.0) + v
            return out
        if self.init == "Alfvenz-rot-shear":
            # rotating-shearing Alfvén eigenmode along z (reference
            # alfvenz_rot_shear, magnetic.f90: dux/dt−2Ωuy=−Ay'' etc.);
            # initializes BOTH aa and (additively) uu
            import numpy as np
            hyd = cfg.module("hydro") if cfg is not None else None
            OO = float(getattr(hyd, "Omega", 0.0) or 0.0)
            kz = self.kz
            a = self.ampl
            z = np.asarray(grid.z)[3:-3]
            fac = complex(OO - np.sqrt(16.0 * kz ** 2 + OO ** 2), 0.0)
            e = np.exp(1j * kz * z)
            root = np.sqrt(complex(2.0 * kz ** 2 + OO * fac))
            ux = (a * fac / (4.0 * kz)) * np.sin(kz * z)
            uy = a * np.real(e * fac * root
                             / (np.sqrt(2.0) * kz * (-6.0 * OO - fac)))
            ax = a * np.sin(kz * z) / kz
            ay = -a * 2.0 * np.sqrt(2.0) * np.imag(
                e * root / (-6.0 * OO - fac) / (1j * kz))
            shape = (spec.nx, spec.ny, spec.nz)
            dt_ = grid.x.dtype

            def bz(v):
                return jnp.asarray(np.broadcast_to(
                    np.real(v)[None, None, :], shape).copy(), dt_)

            zero = jnp.zeros(shape, dt_)
            return {"aa": jnp.stack([bz(ax), bz(ay), zero]),
                    "+uu": jnp.stack([bz(ux), bz(uy), zero])}
        return {"aa": init_vector(self.init, grid, spec, eos, key,
                                  ampl=self.ampl, kx=self.kx, ky=self.ky,
                                  kz=self.kz, sigma=self.relhel_aa,
                                  rnoise_int=self.rnoise_int,
                                  rnoise_ext=self.rnoise_ext,
                                  radius=self.radius,
                                  eps_tube=self.epsilonaa,
                                  center1=self.center1,
                                  r_int=self.r_int, r_ext=self.r_ext,
                                  inclaa=self.inclaa)}
