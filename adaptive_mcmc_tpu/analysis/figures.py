"""Figure generation — the reference's notebook outputs as a reproducible
script (`python -m adaptive_mcmc_tpu.analysis.figures [out_dir]`).

Produces the figure families of /root/reference/python/jupyter (SURVEY
§2.8) from framework primitives:
  * invariance overlays (normal + mixture) — asumptions_check cells 27/78
  * acceptance-rate vs proposal scale — cells 11-14
  * P^n(x,·) step distributions over a grid — cells 16-25
  * contraction τ(P^n) decay curves per proposal scale — cells 43-45
  * kernel-distance ρ(P_σ, P_1) vs σ — cells 100-110
  * adaptation-drift (as_change) vs n with n^(-1/2) guide — the lr-decay
    plots of posteriordb_* notebooks
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from adaptive_mcmc_tpu import (  # noqa: E402
    ARWMHAdaptState,
    ARWMHConfig,
    arwmh,
    asss,
    collect_states_logscale,
    models,
    ns_logscale,
)
from adaptive_mcmc_tpu.analysis.contraction_curves import (  # noqa: E402
    contraction_decay_curve,
    taus_finite_difference_arctan,
)
from adaptive_mcmc_tpu.kernels.asss import (  # noqa: E402
    ASSSAdaptState,
    ASSSConfig,
)
from adaptive_mcmc_tpu.analysis.invariance import (  # noqa: E402
    push_through_kernel,
)
from adaptive_mcmc_tpu.contraction import (  # noqa: E402
    compute_kernel_distance_1d,
    make_sample_px,
)


def _frozen_arwmh(target, loc=0.0, scale=1.0, step=1.0):
    k = arwmh(target, ARWMHConfig(adapt=False))
    adapt = ARWMHAdaptState(
        loc=jnp.full((1, target.dim), loc),
        scale=jnp.full((1, target.dim, target.dim), 0.0)
        + scale * jnp.eye(target.dim),
        log_step_size=jnp.full((1,), jnp.log(step)),
    )
    return k, adapt


def _frozen_asss(target, loc=0.0, scale=1.0):
    k = asss(target, ASSSConfig(adapt=False))
    adapt = ASSSAdaptState(
        loc=jnp.full((1, target.dim), loc),
        scale=scale * jnp.eye(target.dim)[None],
    )
    return k, adapt


def _arctan_probe_grid(n=50, lim=2.5):
    """x = tan(φ) probe grid, dense near the mode, thin in the tails —
    the reference's SSS probe layout (asumptions_check.ipynb cell 83)."""
    phis = np.linspace(-np.arctan(lim), np.arctan(lim), n)
    return jnp.asarray(np.tan(phis))


def _target_1d(tname: str):
    return models.std_normal(1) if tname == "normal" else models.gaussian_mixture_1d()


def _exact_1d_samples(tname: str, key, n: int):
    """Exact draws from the synthetic 1-D targets (normal / 2-component
    mixture, asumptions_check cells 4, 61)."""
    if tname == "normal":
        return jax.random.normal(key, (n,))
    comp = jax.random.bernoulli(key, 0.5, (n,))
    eps = jax.random.normal(jax.random.fold_in(key, 1), (n,))
    return jnp.where(comp, 1.0, -1.0) + 0.1 * eps


def _frozen_1d(kname: str, tname: str, loc=0.0, scale=1.0):
    """Frozen-adapt kernel for the synthetic studies.  kname: rwm | sss."""
    target = _target_1d(tname)
    if kname == "rwm":
        return _frozen_arwmh(target, loc=loc, scale=1.0, step=scale)
    return _frozen_asss(target, loc=loc, scale=scale)


def fig_sss_x_contraction(out_dir: Path, n_samples=100_000):
    """Per-probe τ_x(P^n) curves for the frozen ASSS kernel on the 1-D
    mixture — asumptions_check.ipynb cells 84-87
    (sss-mixture-x-contraction-m{0,1}.svg)."""
    target = models.gaussian_mixture_1d()
    xs = _arctan_probe_grid(50)
    for loc, n_list, fname in [
        (0.0, (1, 2, 5), "sss-mixture-x-contraction-m0"),
        (1.0, (1, 5, 10), "sss-mixture-x-contraction-m1"),
    ]:
        k, adapt = _frozen_asss(target, loc=loc, scale=1.0)
        fig, ax = plt.subplots(figsize=(6, 4))
        for i, n in enumerate(n_list):
            taus = taus_finite_difference_arctan(
                k, jax.random.fold_in(jax.random.PRNGKey(0), i),
                xs, adapt, n_steps=int(n), n_samples=n_samples,
            )
            ax.plot(np.asarray(xs), np.asarray(taus), label=f"$n$ = {n}")
        ax.set_title(rf"$\mu = {loc:g}, \sigma = 1$")
        ax.set_xlabel("$x$")
        ax.set_ylabel(r"contraction estimate $\tau_x(P^n)$")
        ax.legend(loc="upper right")
        fig.savefig(out_dir / f"{fname}.svg", bbox_inches="tight")
        plt.close(fig)


def fig_sss_contraction_decay(out_dir: Path, n_samples=50_000):
    """max_x τ(P_σ^n) decay curves for ASSS adapt states
    (loc, σ) ∈ {0,1} × {0.1, 1, 10} — asumptions_check.ipynb cells 91-96
    (sss-mixture-contraction-decrease-m{0,1}.svg)."""
    target = models.gaussian_mixture_1d()
    xs = _arctan_probe_grid(24)
    ns = (1, 5, 10, 20)
    for loc, fname in [
        (0.0, "sss-mixture-contraction-decrease-m0"),
        (1.0, "sss-mixture-contraction-decrease-m1"),
    ]:
        fig, ax = plt.subplots(figsize=(6, 4))
        for sigma, color in [(0.1, "orange"), (1.0, "blue"), (10.0, "red")]:
            k, adapt = _frozen_asss(target, loc=loc, scale=sigma)
            taus = contraction_decay_curve(
                k, jax.random.PRNGKey(0), xs, adapt, ns=ns,
                taus_fn=taus_finite_difference_arctan,
                n_samples=n_samples,
            )
            ax.plot(ns, np.asarray(taus), ".-", color=color,
                    label=rf"$\mu={loc:g}, \sigma = {sigma:g}$")
        ax.axhline(1.0, ls="--", color="gray")
        ax.set_xticks(ns)
        ax.set_xlabel("power $n$")
        ax.set_ylabel(r"contraction estimate $\tau(P_\sigma^n)$")
        ax.legend(loc="upper right")
        fig.savefig(out_dir / f"{fname}.svg", bbox_inches="tight")
        plt.close(fig)


def fig_sss_kernel_distance(out_dir: Path):
    """ρ(P_σ, P_1) for frozen ASSS kernels as the adapt-state scale moves —
    the SSS side of asumptions_check cells 100-110."""
    target = models.std_normal(1)
    x = jnp.linspace(-2, 2, 12)
    k1, a1 = _frozen_asss(target, scale=1.0)
    rhos = []
    sigmas = np.array([0.25, 0.5, 1.0, 2.0, 4.0])
    for s in sigmas:
        k2, a2 = _frozen_asss(target, scale=float(s))
        rho, _, _ = compute_kernel_distance_1d(
            make_sample_px(k2, a2),
            make_sample_px(k1, a1),
            jax.random.PRNGKey(0),
            x,
            sample_batch_size=2000,
            n_eval_batches=16,
            max_steps=40,
        )
        rhos.append(float(rho))
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.semilogx(sigmas, rhos, "o-")
    ax.set_xlabel(r"adapt-state scale $\sigma$")
    ax.set_ylabel(r"$\rho(P_\sigma, P_1)$ (ASSS)")
    fig.savefig(out_dir / "sss-normal-kernel-dist-scale.svg",
                bbox_inches="tight")
    plt.close(fig)


def fig_invariance(out_dir: Path, n=200_000):
    for name, target, density in [
        (
            "normal-invariance",
            models.std_normal(1),
            lambda g: np.exp(-0.5 * g**2) / np.sqrt(2 * np.pi),
        ),
        (
            "mixture-invariance",
            models.gaussian_mixture_1d(),
            lambda g: 0.5
            * (
                np.exp(-0.5 * ((g + 1) / 0.1) ** 2)
                + np.exp(-0.5 * ((g - 1) / 0.1) ** 2)
            )
            / (0.1 * np.sqrt(2 * np.pi)),
        ),
    ]:
        for kname, build in [("rwm", arwmh), ("sss", asss)]:
            key = jax.random.PRNGKey(0)
            if name.startswith("normal"):
                exact = jax.random.normal(key, (n, 1))
            else:
                comp = jax.random.bernoulli(key, 0.5, (n, 1))
                exact = jnp.where(comp, 1.0, -1.0) + 0.1 * jax.random.normal(
                    jax.random.fold_in(key, 1), (n, 1)
                )
            kernel = build(target)
            pushed = push_through_kernel(
                kernel, jax.random.PRNGKey(1), exact, n_steps=1
            )
            grid = np.linspace(-3, 3, 400)
            fig, ax = plt.subplots(figsize=(6, 4))
            ax.hist(
                np.asarray(pushed[:, 0]), bins=120, density=True,
                alpha=0.5, label=f"π P ({kname})",
            )
            ax.plot(grid, density(grid), "k-", lw=1.5, label="π")
            ax.set_xlim(-3, 3)
            ax.legend()
            ax.set_title(f"Invariance: one {kname} step from exact π")
            fig.savefig(out_dir / f"{kname}-{name}.svg", bbox_inches="tight")
            plt.close(fig)


def fig_accept_rate(out_dir: Path, n_iters=3000, n_chains=256):
    target = models.std_normal(1)
    scales = np.geomspace(0.05, 30, 16)
    rates = []
    for s in scales:
        k, adapt = _frozen_arwmh(target, step=float(s))
        adapt = jax.tree.map(
            lambda a: jnp.repeat(a, n_chains, axis=0), adapt
        )
        st = k.init(
            jax.random.PRNGKey(0), n_chains=n_chains, adapt_state=adapt
        )
        st = jax.lax.fori_loop(0, n_iters, lambda _, x: k.step(x), st)
        rates.append(float(jnp.mean(st.mean_accept_prob)))
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.semilogx(scales, rates, "o-")
    ax.axhline(0.234, color="r", ls="--", label="0.234 target")
    ax.set_xlabel("proposal step size")
    ax.set_ylabel("acceptance rate")
    ax.legend()
    fig.savefig(out_dir / "accept-rate-vs-scale.svg", bbox_inches="tight")
    plt.close(fig)


def fig_pnx_distributions(out_dir: Path, n_samples=20_000):
    from adaptive_mcmc_tpu.infer.mcmc import sample_pnx

    target = models.std_normal(1)
    k, adapt = _frozen_arwmh(target)
    xs = jnp.array([[-2.0], [0.0], [2.0]])
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.2), sharey=True)
    for ax, n in zip(axes, [1, 8, 64]):
        out = sample_pnx(
            k, jax.random.PRNGKey(0), xs, adapt, n=n, n_samples=n_samples
        )
        for i, x0 in enumerate([-2.0, 0.0, 2.0]):
            ax.hist(
                np.asarray(out[i, :, 0]), bins=80, density=True,
                alpha=0.45, label=f"x={x0:g}",
            )
        grid = np.linspace(-4, 4, 300)
        ax.plot(grid, np.exp(-0.5 * grid**2) / np.sqrt(2 * np.pi), "k-")
        ax.set_title(f"P^{n}(x, ·)")
    axes[0].legend()
    fig.savefig(out_dir / "pnx-distributions.svg", bbox_inches="tight")
    plt.close(fig)


def fig_contraction_decay(out_dir: Path, n_samples=5000):
    target = models.std_normal(1)
    xs = jnp.linspace(-2, 2, 9)
    ns = (1, 2, 4, 8, 16, 32)
    fig, ax = plt.subplots(figsize=(6, 4))
    for s in [0.1, 1.0, 10.0]:
        k, adapt = _frozen_arwmh(target, step=s)
        taus = contraction_decay_curve(
            k, jax.random.PRNGKey(0), xs, adapt, ns=ns, n_samples=n_samples
        )
        ax.semilogy(ns, np.asarray(taus), "o-", label=f"step={s:g}")
    ax.axhline(1.0, color="k", lw=0.8)
    ax.set_xlabel("n (kernel steps)")
    ax.set_ylabel(r"$\max_x \tau_x(P^n)$")
    ax.legend()
    fig.savefig(out_dir / "contraction-decay.svg", bbox_inches="tight")
    plt.close(fig)


def fig_kernel_distance(out_dir: Path):
    """ρ(P_σ, P_1) vs proposal scale for the frozen RWM kernel on the 1-D
    normal — asumptions_check cell 104 (rwm-normal-kernel-dist-scale.svg)
    plus the earlier wide-range σ ∈ [0.1, 10] variant the reference keeps
    as rwm-normal-kernel-dist.svg (labels recovered from the SVG text)."""
    target = models.std_normal(1)
    x = jnp.linspace(-2, 2, 12)
    k1, a1 = _frozen_arwmh(target, step=1.0)

    def rho_at(s):
        k2, a2 = _frozen_arwmh(target, step=float(s))
        rho, _, _ = compute_kernel_distance_1d(
            make_sample_px(k2, a2),
            make_sample_px(k1, a1),
            jax.random.PRNGKey(0),
            x,
            sample_batch_size=2000,
            n_eval_batches=16,
            max_steps=40,
        )
        return float(rho)

    for sigmas, ylab, fname in [
        (
            np.array([0.25, 0.5, 1.0, 2.0, 4.0]),
            r"kernel distance estimate $\rho(P_{\sigma}, P_{1})$",
            "rwm-normal-kernel-dist-scale",
        ),
        (
            np.geomspace(0.1, 10.0, 9),
            r"kernel distance $\rho(P_{\sigma}, P_{1})$",
            "rwm-normal-kernel-dist",
        ),
    ]:
        rhos = [rho_at(s) for s in sigmas]
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.plot(sigmas, rhos, ".-")
        ax.semilogx()
        ax.set_xlabel(r"scale $\sigma$, logarithmic")
        ax.set_ylabel(ylab)
        ax.set_ylim(bottom=0)
        fig.savefig(out_dir / f"{fname}.svg", bbox_inches="tight")
        plt.close(fig)


def fig_adaptation_drift(out_dir: Path, n_pow=4):
    target = models.eight_schools_centered()
    fig, ax = plt.subplots(figsize=(6, 4))
    ns = np.asarray(ns_logscale(n_pow))
    for lr_decay, color in [(1.0, "C0"), (2 / 3, "C1"), (0.5, "C2")]:
        k = arwmh(target, ARWMHConfig(lr_decay=lr_decay))
        states, _ = collect_states_logscale(
            k, jax.random.PRNGKey(0), n_pow=n_pow, n_chains=8
        )
        drift = np.asarray(jnp.mean(states.as_change, axis=1))
        ax.loglog(ns, drift, color=color, label=f"a={lr_decay:.3g}")
    ax.loglog(ns, 1.0 / np.sqrt(ns), "k--", lw=0.8, label=r"$n^{-1/2}$")
    ax.set_xlabel("iteration n")
    ax.set_ylabel(r"$\|\Delta(\lambda\Sigma^{1/2})\|_F$")
    ax.legend()
    fig.savefig(out_dir / "adaptation-drift.svg", bbox_inches="tight")
    plt.close(fig)


def fig_x_step(out_dir: Path, n_samples=50_000):
    """E[x_next] + 50%/90% CI bands of P^n(x, ·) over a probe grid — the
    per-n step-distribution family (asumptions_check cells 16-25;
    {rwm,sss}-{normal,mixture}-x-step-*.svg)."""
    from adaptive_mcmc_tpu.infer.mcmc import sample_pnx

    xs = jnp.linspace(-5, 5, 100)
    cases = [
        ("rwm", [None], (1, 2, 5, 10, 20, 50)),
        ("sss", [0.0, 1.0], (1, 2, 5)),
    ]
    for tname in ("normal", "mixture"):
        for kname, locs, ns in cases:
            for loc in locs:
                k, adapt = _frozen_1d(kname, tname, loc=loc or 0.0)
                for n in ns:
                    Px = sample_pnx(
                        k, jax.random.PRNGKey(0), xs[:, None], adapt,
                        n=int(n), n_samples=n_samples,
                    )[:, :, 0]
                    mean = np.asarray(jnp.mean(Px, axis=1))
                    q = np.asarray(
                        jnp.quantile(
                            Px, jnp.array([0.05, 0.25, 0.75, 0.95]), axis=1
                        )
                    )
                    fig, ax = plt.subplots(figsize=(5, 5))
                    mtag = "" if loc is None else rf"\mu={loc:g}, "
                    ax.set_title(rf"${mtag}\sigma=1, n={n}$")
                    ax.plot(np.asarray(xs), mean, color="blue",
                            label="$E[x_{next}]$")
                    ax.fill_between(np.asarray(xs), q[1], q[2], alpha=0.5,
                                    color="blue", label="50% CI")
                    ax.fill_between(np.asarray(xs), q[0], q[3], alpha=0.3,
                                    color="blue", label="90% CI")
                    ax.plot(np.asarray(xs), np.asarray(xs), "--",
                            color="gray", label=r"$x = x_{next}$")
                    ax.set_xlabel("$x$")
                    ax.legend(loc="upper left")
                    stem = (
                        f"{kname}-{tname}-x-step-s1-n{n}"
                        if loc is None
                        else f"{kname}-{tname}-x-step-m{int(loc)}-s1-n{n}"
                    )
                    fig.savefig(out_dir / f"{stem}.svg", bbox_inches="tight")
                    plt.close(fig)


def fig_x_step_grids(out_dir: Path, n_samples=100_000):
    """Aggregate 2×2 step-distribution panels — asumptions_check cells
    18/22/70/73 ({rwm-*-x-step-s1, sss-*-x-step-m01-s1}.svg).  RWM panels
    sweep n ∈ {1,5,10,50}; SSS panels sweep (μ, n) ∈ {0,1} × {1,2}."""
    from adaptive_mcmc_tpu.infer.mcmc import sample_pnx

    def _panel(ax, k, adapt, xs, n, title, modes, lim):
        Px = sample_pnx(
            k, jax.random.PRNGKey(0), xs[:, None], adapt,
            n=int(n), n_samples=n_samples,
        )[:, :, 0]
        x = np.asarray(xs)
        mean = np.asarray(jnp.mean(Px, axis=1))
        q = np.asarray(
            jnp.quantile(Px, jnp.array([0.05, 0.25, 0.75, 0.95]), axis=1)
        )
        ax.set_title(title)
        ax.plot(x, mean, color="blue", label="$E[x_{next}]$")
        ax.fill_between(x, q[1], q[2], alpha=0.5, color="blue",
                        label="50% CI")
        ax.fill_between(x, q[0], q[3], alpha=0.3, color="blue",
                        label="90% CI")
        ax.plot(x, x, "--", color="gray", label=r"$x = x_{next}$")
        ax.vlines(modes, -lim, lim, linestyles="--", color="green",
                  label=r"mode(s) of target $\pi$")
        ax.set_xlabel("$x$")
        ax.set_ylabel("$x_{next}$")

    for tname, lim, modes in (("normal", 5.0, [0.0]),
                              ("mixture", 2.5, [-1.0, 1.0])):
        xs = jnp.linspace(-lim, lim, 100)
        # RWM: one frozen kernel, four powers.
        k, adapt = _frozen_1d("rwm", tname)
        fig, axs = plt.subplots(2, 2, figsize=(10, 10))
        for n, ax in zip((1, 5, 10, 50), axs.flatten()):
            _panel(ax, k, adapt, xs, n, rf"$\sigma=1, n={n}$", modes, lim)
        axs[1, 1].legend(loc="lower right")
        fig.savefig(out_dir / f"rwm-{tname}-x-step-s1.svg",
                    bbox_inches="tight")
        plt.close(fig)
        # SSS: rows sweep the adapt-state loc, columns the power.
        fig, axs = plt.subplots(2, 2, figsize=(10, 10))
        for loc, row in zip((0.0, 1.0), axs):
            k, adapt = _frozen_1d("sss", tname, loc=loc)
            for n, ax in zip((1, 2), row):
                _panel(ax, k, adapt, xs, n,
                       rf"$\mu={int(loc)}, \sigma=1, n={n}$", modes, lim)
        axs[1, 1].legend(loc="lower right")
        fig.savefig(out_dir / f"sss-{tname}-x-step-m01-s1.svg",
                    bbox_inches="tight")
        plt.close(fig)


def fig_x_wasserstein(out_dir: Path, n_samples=50_000):
    """W_1(P(x,·), π) vs x per adapt-state scale, with the eccentricity
    E|π − x| guide (asumptions_check cells 19-21;
    *-x-wasserstein*.svg)."""
    from adaptive_mcmc_tpu.infer.mcmc import sample_pnx
    from adaptive_mcmc_tpu.metrics.sliced import wasserstein_1d

    xs = jnp.linspace(-5, 5, 100)
    for tname in ("normal", "mixture"):
        pi = _exact_1d_samples(tname, jax.random.PRNGKey(42), n_samples)
        ecc = np.asarray(
            jnp.mean(jnp.abs(pi[None, :] - xs[:, None]), axis=1)
        )
        for kname, locs in (("rwm", [None]), ("sss", [0.0, 1.0])):
            for loc in locs:
                fig, ax = plt.subplots(figsize=(6, 4))
                ax.plot(np.asarray(xs), ecc, "--", color="gray",
                        label="eccentricity")
                for sigma, color in ((0.1, "orange"), (1.0, "blue"),
                                     (10.0, "red")):
                    k, adapt = _frozen_1d(
                        kname, tname, loc=loc or 0.0, scale=sigma
                    )
                    Px = sample_pnx(
                        k, jax.random.PRNGKey(0), xs[:, None], adapt,
                        n=1, n_samples=n_samples,
                    )[:, :, 0]
                    w = np.asarray(wasserstein_1d(Px, pi))
                    mtag = "" if loc is None else rf"\mu={loc:g}, "
                    ax.plot(np.asarray(xs), w, color=color,
                            label=rf"${mtag}\sigma = {sigma:g}$")
                ax.set_xlabel("$x$")
                ax.set_ylabel(r"$\mathcal{W}(\delta_x P_{\mu,\sigma}, \pi)$")
                ax.legend(loc="center right")
                stem = (
                    f"{kname}-{tname}-x-wasserstein"
                    if loc is None
                    else f"{kname}-{tname}-x-wasserstein-m{int(loc)}"
                )
                fig.savefig(out_dir / f"{stem}.svg", bbox_inches="tight")
                plt.close(fig)


def fig_x_contraction(out_dir: Path, n_samples=50_000):
    """Per-probe τ_x(P^n) curves for every (kernel, target, loc) cell of
    the reference (cells 30-36 RWM, 81-87 SSS; *-x-contraction*.svg).
    The SSS mixture pair is produced by fig_sss_x_contraction."""
    from adaptive_mcmc_tpu.analysis.contraction_curves import (
        taus_finite_difference,
    )

    cases = [
        ("rwm", "normal", None, (1, 2, 5)),
        ("rwm", "mixture", None, (1, 2, 5)),
        ("sss", "normal", 0.0, (1, 2)),
        ("sss", "normal", 1.0, (1, 5, 10)),
    ]
    for kname, tname, loc, ns in cases:
        xs = (
            jnp.linspace(-2.5, 2.5, 50)
            if kname == "rwm"
            else _arctan_probe_grid(50)
        )
        k, adapt = _frozen_1d(kname, tname, loc=loc or 0.0)
        taus_fn = (
            taus_finite_difference
            if kname == "rwm"
            else taus_finite_difference_arctan
        )
        fig, ax = plt.subplots(figsize=(6, 4))
        for i, n in enumerate(ns):
            taus = taus_fn(
                k, jax.random.fold_in(jax.random.PRNGKey(0), i), xs, adapt,
                n_steps=int(n), n_samples=n_samples,
            )
            ax.plot(np.asarray(xs), np.asarray(taus), label=f"$n$ = {n}")
        mtag = "" if loc is None else rf"$\mu = {loc:g}, \sigma = 1$"
        if mtag:
            ax.set_title(mtag)
        ax.set_xlabel("$x$")
        ax.set_ylabel(r"contraction estimate $\tau_x(P^n)$")
        ax.legend(loc="upper right")
        stem = (
            f"{kname}-{tname}-x-contraction"
            if loc is None
            else f"{kname}-{tname}-x-contraction-m{int(loc)}"
        )
        fig.savefig(out_dir / f"{stem}.svg", bbox_inches="tight")
        plt.close(fig)


def fig_contraction_decrease(out_dir: Path, n_samples=30_000):
    """max_x τ(P^n) decay per adapt scale for the remaining cells
    (rwm-{normal,mixture} and sss-normal m0/m1; the sss-mixture pair is
    fig_sss_contraction_decay)."""
    from adaptive_mcmc_tpu.analysis.contraction_curves import (
        taus_finite_difference,
    )

    cases = [
        ("rwm", "normal", None),
        ("rwm", "mixture", None),
        ("sss", "normal", 0.0),
        ("sss", "normal", 1.0),
    ]
    for kname, tname, loc in cases:
        xs = (
            jnp.linspace(-2.5, 2.5, 24)
            if kname == "rwm"
            else _arctan_probe_grid(24)
        )
        ns = (1, 2, 3, 4, 5) if kname == "rwm" else (1, 5, 10, 20)
        fig, ax = plt.subplots(figsize=(6, 4))
        for sigma, color in ((0.1, "orange"), (1.0, "blue"), (10.0, "red")):
            k, adapt = _frozen_1d(kname, tname, loc=loc or 0.0, scale=sigma)
            kw = {}
            if kname == "sss":
                kw["taus_fn"] = taus_finite_difference_arctan
            else:
                kw["taus_fn"] = taus_finite_difference
            taus = contraction_decay_curve(
                k, jax.random.PRNGKey(0), xs, adapt, ns=ns,
                n_samples=n_samples, **kw,
            )
            mtag = rf"\mu={loc:g}, " if loc is not None else ""
            ax.plot(ns, np.asarray(taus), ".-", color=color,
                    label=rf"${mtag}\sigma = {sigma:g}$")
        ax.axhline(1.0, ls="--", color="gray")
        ax.set_xticks(ns)
        ax.set_xlabel("power $n$")
        ax.set_ylabel(r"contraction estimate $\tau(P_{\mu,\sigma}^n)$")
        ax.legend(loc="upper right")
        stem = (
            f"{kname}-{tname}-contraction-decrease"
            if loc is None
            else f"{kname}-{tname}-contraction-decrease-m{int(loc)}"
        )
        fig.savefig(out_dir / f"{stem}.svg", bbox_inches="tight")
        plt.close(fig)


def fig_kernel_dist_families(out_dir: Path):
    """Lipschitz-NN kernel-distance curves vs adapt-state perturbation:
    ρ(P_σ, P_1) for RWM and SSS (scale, at loc 0 and 1) and ρ(P_μ, P_0)
    for SSS (loc) — asumptions_check cells 100-110."""
    x = jnp.linspace(-2, 2, 12)

    def rho_curve(kname, tname, base_kwargs, comp_kwargs_list):
        kb, ab = _frozen_1d(kname, tname, **base_kwargs)
        rhos = []
        for ckw in comp_kwargs_list:
            kc, ac = _frozen_1d(kname, tname, **ckw)
            rho, _, _ = compute_kernel_distance_1d(
                make_sample_px(kc, ac), make_sample_px(kb, ab),
                jax.random.PRNGKey(0), x,
                sample_batch_size=2000, n_eval_batches=16, max_steps=40,
            )
            rhos.append(float(rho))
        return rhos

    scales = np.array([0.25, 0.5, 1.0, 2.0, 4.0])
    # SSS scale at loc=1 (sss-normal-kernel-dist-scale-m1.svg)
    rhos = rho_curve(
        "sss", "normal", dict(loc=1.0, scale=1.0),
        [dict(loc=1.0, scale=float(s)) for s in scales],
    )
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.semilogx(scales, rhos, ".-")
    ax.set_title(r"$\mu=1$")
    ax.set_xlabel(r"scale $\sigma$, logarithmic")
    ax.set_ylabel(r"kernel distance estimate $\rho(P_{1,\sigma}, P_{1,1})$")
    fig.savefig(out_dir / "sss-normal-kernel-dist-scale-m1.svg",
                bbox_inches="tight")
    plt.close(fig)

    # SSS loc at sigma=1 (sss-normal-kernel-dist-loc.svg)
    locs = np.linspace(0.0, 2.0, 9)
    rhos = rho_curve(
        "sss", "normal", dict(loc=0.0, scale=1.0),
        [dict(loc=float(m), scale=1.0) for m in locs],
    )
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(locs, rhos, ".-")
    ax.set_title(r"$\sigma=1$")
    ax.set_xlabel(r"location $\mu$")
    ax.set_ylabel(r"kernel distance estimate $\rho(P_{\mu,1}, P_{0,1})$")
    fig.savefig(out_dir / "sss-normal-kernel-dist-loc.svg",
                bbox_inches="tight")
    plt.close(fig)


def fig_contraction_dual(out_dir: Path):
    """f(x) and Pf(x) panels across Lipschitz-NN training-step budgets
    {0, 5, 10, 100} — the estimator-convergence visualization
    (asumptions_check cells 97-98, *-contraction-dual*.svg)."""
    from adaptive_mcmc_tpu.contraction import (
        apply_lipschitz_mlp,
        compute_wasserstein_contraction,
    )

    steps = (0, 5, 10, 100)
    xs = jnp.linspace(-2.5, 2.5, 100)
    X = xs[:, None]
    cases = [
        ("rwm", "normal", None),
        ("rwm", "mixture", None),
        ("sss", "normal", 0.0),
        ("sss", "normal", 1.0),
        ("sss", "mixture", 0.0),
        ("sss", "mixture", 1.0),
    ]
    for kname, tname, loc in cases:
        k, adapt = _frozen_1d(kname, tname, loc=loc or 0.0)
        sample_px = make_sample_px(k, adapt)
        fig, (ax1, ax2) = plt.subplots(
            1, 2, figsize=(12.8, 4.8), sharey=True
        )
        colors = ["royalblue", "blue", "mediumblue", "midnightblue"]
        for step, color in zip(steps, colors):
            _, _, params = compute_wasserstein_contraction(
                sample_px, jax.random.PRNGKey(0), X,
                sample_batch_size=1000, n_train_batches=8,
                n_eval_batches=1, max_steps=step,
            )
            fx = np.asarray(apply_lipschitz_mlp(params, X))
            samp = sample_px(jax.random.PRNGKey(1), X, 20_000)
            Pfx = np.asarray(
                jnp.mean(apply_lipschitz_mlp(params, samp), axis=1)
            )
            ax1.plot(np.asarray(xs), fx, color=color, label=f"steps={step}")
            ax2.plot(np.asarray(xs), Pfx, color=color, label=f"steps={step}")
        if loc is not None:
            fig.suptitle(rf"$\mu={loc:g}, \sigma=1$")
        ax1.set_ylabel("f(x)")
        ax2.set_ylabel("Pf(x)")
        ax1.set_xlabel("x")
        ax2.set_xlabel("x")
        ax1.legend(loc="lower right")
        stem = (
            f"{kname}-{tname}-contraction-dual"
            if loc is None
            else f"{kname}-{tname}-contraction-dual-m{int(loc)}"
        )
        fig.savefig(out_dir / f"{stem}.svg", bbox_inches="tight")
        plt.close(fig)


ALL_FIGURES = {
    "invariance": fig_invariance,
    "accept_rate": fig_accept_rate,
    "pnx": fig_pnx_distributions,
    "contraction": fig_contraction_decay,
    "kernel_distance": fig_kernel_distance,
    "adaptation_drift": fig_adaptation_drift,
    "sss_x_contraction": fig_sss_x_contraction,
    "sss_contraction": fig_sss_contraction_decay,
    "sss_kernel_distance": fig_sss_kernel_distance,
    "x_step": fig_x_step,
    "x_step_grids": fig_x_step_grids,
    "x_wasserstein": fig_x_wasserstein,
    "x_contraction": fig_x_contraction,
    "contraction_decrease": fig_contraction_decrease,
    "kernel_dist_families": fig_kernel_dist_families,
    "contraction_dual": fig_contraction_dual,
}


def main(out_dir: str = "img", only=None):
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for name, fn in ALL_FIGURES.items():
        if only and name not in only:
            continue
        print(f"[fig] {name} ...", flush=True)
        fn(out)
    print(f"figures written to {out}/")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "img",
         only=set(sys.argv[2:]) or None)
