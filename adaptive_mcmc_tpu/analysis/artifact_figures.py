"""Per-target posterior figure families built from sweep artifacts.

Reproduces the posteriordb notebooks' figure cells as scripts over the
framework's saved runs (mcmc_runs/lr_decay/**, mcmc_runs/w_eval/**):

* lr-decay PE overlays (mean + 90% CI over 100 seeds, PE normalized by
  pe_offset, gold-standard 90% CI guides) —
  posteriordb_eight-schools.ipynb cells 37-42
* lr-decay adaptation-drift overlays with the n^(-1/2) guide — cells 44-48
* phi-estimator (min_j theta_j) convergence bands — cells 22, 59-60
* 100-seed metric boxplots + aggregate table — cells 65-70
* kidiq posterior-predictive panels over a mom_iq grid —
  posteriordb_kidiq-kidscore.ipynb cells 77-79

Each figure function degrades gracefully (returns False) when its input
artifacts have not been generated yet.

Run:  python -m adaptive_mcmc_tpu.analysis.artifact_figures [img_dir]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from adaptive_mcmc_tpu.analysis.posterior import pe_offset  # noqa: E402
from adaptive_mcmc_tpu.experiments.runner import TARGETS  # noqa: E402

RUNS = Path("mcmc_runs")
DECAY_LABELS = [(0.5, r"\frac{1}{2}"), (2 / 3, r"\frac{2}{3}"), (1.0, "1")]
LR_TARGETS = {
    "eight_schools": "eight_schools_centered",
    "diamonds": "diamonds",
    "kidiq": "kidiq",
}
# output file names follow the reference img/svg inventory exactly
FIG_KERNEL = {"arwmh": "rwm", "asss": "sss", "nuts": "nuts"}
PHI_KERNEL = {"arwmh": "arwm", "asss": "asss", "nuts": "nuts"}
FIG_TARGET = {"eight_schools": "eight-schools", "diamonds": "diamonds",
              "kidiq": "kidiq"}


def _gold(target_name: str):
    """Gold draws with get_reference_draws' resolution order: vendored
    real gold (models/_gold/, the reference's checked-in PosteriorDB
    draws) beats a cached self-generated NUTS run — figures must grade
    against the same gold standard the RESULTS tables use."""
    from adaptive_mcmc_tpu.experiments.evaluate import vendored_gold_draws

    g = vendored_gold_draws(target_name)
    if g is not None:
        return np.asarray(g)
    f = RUNS / "reference_draws" / f"{target_name}_nuts.npy"
    return np.load(f) if f.exists() else None


def _lr_npz(lr_target: str, kernel: str, decay: float):
    f = RUNS / "lr_decay" / lr_target / kernel / f"decay_{decay:.4g}.npz"
    return np.load(f) if f.exists() else None


def fig_lr_decay_pe(target_name: str, kernel: str, out_dir: Path) -> bool:
    """PE traces on the log grid per lr_decay (ipynb cells 37-42)."""
    lr_target = LR_TARGETS[target_name]
    target = TARGETS[lr_target]()
    gold = _gold(target_name)
    runs = {d: _lr_npz(lr_target, kernel, d) for d, _ in DECAY_LABELS}
    if gold is None or any(v is None for v in runs.values()):
        return False
    # pe_offset normalizes against the gold draws of the *noncentered*
    # eval target; the centered lr-decay model has a different PE scale,
    # so compute the offset from the lr-decay model's own density at the
    # gold positions mapped into its parametrization when shapes match,
    # else from the run's own late-time PE.
    ns = np.asarray(runs[1.0]["i"])  # stored log-grid iteration indices
    fig, ax = plt.subplots(figsize=(6.5, 4.2))
    gold_pe = None
    if lr_target == target_name and gold.shape[1] == target.dim:
        gold_pe = np.asarray(jax.vmap(target.potential_fn)(jnp.asarray(gold)))
    elif target_name == "eight_schools":
        # gold draws live in the noncentered space [mu, log_tau,
        # theta_base]; the centered posterior is its exact pushforward
        # under theta = mu + tau * theta_base.
        mu, lt, tb = gold[:, :1], gold[:, 1:2], gold[:, 2:]
        centered = np.concatenate([mu, lt, mu + np.exp(lt) * tb], axis=1)
        gold_pe = np.asarray(
            jax.vmap(target.potential_fn)(jnp.asarray(centered))
        )
    for (decay, lab), color in zip(DECAY_LABELS, ("C0", "C1", "C2")):
        pes = np.asarray(runs[decay]["potential_energy"]).T  # (seeds, T)
        off = (
            float(pe_offset(jnp.asarray(gold_pe)))
            if gold_pe is not None
            else float(pe_offset(jnp.asarray(pes[:, -50:].ravel())))
        )
        pes = pes - off
        ax.plot(ns, pes.mean(0), color=color, label=rf"$a={lab}$")
        ax.fill_between(
            ns, np.quantile(pes, 0.05, 0), np.quantile(pes, 0.95, 0),
            alpha=0.2, color=color,
        )
        if gold_pe is not None:
            lo, hi = np.quantile(gold_pe - off, [0.05, 0.95])
            ax.hlines([lo, hi], 1, ns[-1], linestyles="--", color="gray",
                      alpha=0.5)
    ax.set_xscale("log")
    ax.set_xlabel(r"step $n$")
    ax.set_ylabel(r"potential energy $U_n$")
    lo = np.quantile(
        np.asarray(runs[1.0]["potential_energy"])[-100:], [0.01, 0.99]
    )
    ax.set_ylim(lo[0] - 5, lo[1] + 25)
    ax.legend(loc="upper right")
    fig.savefig(
        out_dir
        / f"{FIG_KERNEL[kernel]}-pe-lr-{FIG_TARGET[target_name]}.svg",
        bbox_inches="tight",
    )
    plt.close(fig)
    return True


def fig_lr_decay_adaptation(
    target_name: str, kernel: str, out_dir: Path
) -> bool:
    """Adaptation-drift d_n vs n with the n^(-1/2) guide (cells 44-48)."""
    lr_target = LR_TARGETS[target_name]
    runs = {d: _lr_npz(lr_target, kernel, d) for d, _ in DECAY_LABELS}
    if any(v is None for v in runs.values()):
        return False
    ns = np.asarray(runs[1.0]["i"])  # stored log-grid iteration indices
    fig, ax = plt.subplots(figsize=(6.5, 4.2))
    for (decay, lab), color in zip(DECAY_LABELS, ("C0", "C1", "C2")):
        diffs = np.asarray(runs[decay]["as_change"]).T  # (seeds, T)
        ax.plot(ns, diffs.mean(0), color=color, label=rf"$a={lab}$")
        ax.fill_between(
            ns, np.quantile(diffs, 0.05, 0), np.quantile(diffs, 0.95, 0),
            alpha=0.2, color=color,
        )
    ax.plot(ns, 1.0 / np.sqrt(ns), "--", color="gray",
            label=r"$n^{-\frac{1}{2}}$")
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_ylim(bottom=1e-6)
    ax.set_xlabel(r"step $n$")
    ax.set_ylabel(r"adaptation changes $d_n$")
    ax.legend(loc="lower left")
    fig.savefig(
        out_dir
        / f"{FIG_KERNEL[kernel]}-adaptation-lr-{FIG_TARGET[target_name]}.svg",
        bbox_inches="tight",
    )
    plt.close(fig)
    return True


def _school_effects(target, draws: np.ndarray) -> np.ndarray:
    """theta_j per draw for either eight-schools parametrization."""
    sites = target.constrain(jnp.asarray(draws))
    if "theta_base" in sites:
        theta = (
            np.asarray(sites["mu"])[..., None]
            + np.asarray(sites["tau"])[..., None]
            * np.asarray(sites["theta_base"])
        )
    else:
        theta = np.asarray(sites["theta"])
    return theta


def _phi_of(target_name: str, target):
    """Per-target functional of the phi-convergence study: eight-schools
    uses min_j theta_j (eight-schools nb cells 59-60); diamonds uses the
    uncentered intercept b_Intercept = Intercept - mean(X)·b (diamonds
    nb cell 37 ``get_intercept``) — both on raw draws (those coordinates
    are untransformed in the unconstrained space)."""
    if target_name == "diamonds":
        from adaptive_mcmc_tpu.models import data as _data

        mx = np.asarray(_data.diamonds()["X"])[:, 1:].mean(axis=0)

        def phi(draws: np.ndarray) -> np.ndarray:
            return draws[..., 0] - draws[..., 1 : 1 + mx.shape[0]] @ mx

        return phi
    return lambda draws: _school_effects(target, draws).min(axis=-1)


def fig_phi_convergence(out_dir: Path, target_name="eight_schools") -> bool:
    """phi running-estimator convergence per kernel (eight-schools nb
    cells 22, 59-60; diamonds nb cells 72-75)."""
    target = TARGETS[target_name]()
    gold = _gold(target_name)
    if gold is None:
        return False
    phi_fn = _phi_of(target_name, target)
    ref_phi = phi_fn(np.asarray(gold)).mean()
    made = False
    for kernel, color in (("arwmh", "C3"), ("asss", "C4"), ("nuts", "C5")):
        f = RUNS / "w_eval" / target_name / f"{kernel}.npz"
        if not f.exists():
            continue
        with np.load(f) as d:
            samples = d["samples"]  # (seeds, draws, dim)
        phis = phi_fn(np.asarray(samples))  # (seeds, draws)
        cum = np.cumsum(phis, axis=1) / np.arange(1, phis.shape[1] + 1)
        cum = cum - ref_phi
        ns = np.arange(1, cum.shape[1] + 1)
        fig, ax = plt.subplots(figsize=(6.0, 4.0))
        ax.set_title(kernel)
        ax.plot(ns, cum.mean(0), color=color, label="mean")
        ax.fill_between(ns, np.quantile(cum, 0.25, 0),
                        np.quantile(cum, 0.75, 0), alpha=0.5, color=color,
                        label="50% CI")
        ax.fill_between(ns, np.quantile(cum, 0.05, 0),
                        np.quantile(cum, 0.95, 0), alpha=0.2, color=color,
                        label="90% CI")
        if target_name == "eight_schools":
            ax.set_ylim(-0.5, 0.5)
        ax.set_xlabel(r"number of samples $n$")
        ax.set_ylabel(r"estimator $\widehat{\pi}_n(\varphi)$")
        ax.legend(loc="upper right")
        fig.savefig(
            out_dir
            / f"{PHI_KERNEL[kernel]}-phi-eval-{FIG_TARGET[target_name]}.svg",
            bbox_inches="tight",
        )
        plt.close(fig)
        made = True
    return made


def fig_metric_boxplots(out_dir: Path, target_name: str) -> bool:
    """100-seed rmse/W/MMD boxplots + aggregate table (cells 65-70)."""
    import pandas as pd
    import seaborn as sns

    frames = []
    for kernel in ("arwmh", "asss", "nuts"):
        f = RUNS / "w_eval" / target_name / f"eval_{kernel}.csv"
        if f.exists():
            frames.append(
                pd.read_csv(
                    f, usecols=["rng_seed", "rmse_means", "wasserstein",
                                "mmd"]
                ).assign(algorithm=kernel)
            )
    if not frames:
        return False
    df = pd.concat(frames, ignore_index=True)
    sns.set_palette(sns.color_palette("deep")[3:6])
    for metric in ("rmse_means", "wasserstein", "mmd"):
        fig, ax = plt.subplots(figsize=(5.0, 4.0))
        sns.boxplot(df, x="algorithm", y=metric, hue="algorithm",
                    whis=[5, 95], ax=ax)
        name = "rmse" if metric == "rmse_means" else metric
        fig.savefig(
            out_dir / f"{name}-eval-{FIG_TARGET[target_name]}.svg",
            bbox_inches="tight",
        )
        plt.close(fig)
    agg = df.groupby("algorithm")[
        ["rmse_means", "wasserstein", "mmd"]
    ].agg(["mean", "std"])
    agg.to_csv(out_dir / f"eval-aggregate-{FIG_TARGET[target_name]}.csv")
    return True


def fig_kidiq_predictive(out_dir: Path) -> bool:
    """Posterior-predictive kid_score over a mom_iq grid, split by mom_hs
    (kidiq notebook cells 77-79)."""
    f = RUNS / "w_eval" / "kidiq" / "nuts.npz"
    if not f.exists():
        return False
    target = TARGETS["kidiq"]()
    with np.load(f) as d:
        draws = d["samples"][0]  # one seed's 10k draws
    sites = target.constrain(jnp.asarray(draws))
    beta = np.asarray(sites["beta"])          # (n, 3)
    sigma = np.asarray(sites["sigma"])        # (n,)
    mom_iq = np.concatenate([np.arange(70, 140)] * 2).astype(np.float32)
    mom_hs = np.concatenate(
        [np.zeros(70), np.ones(70)]
    ).astype(np.float32)
    Xg = np.stack([np.ones_like(mom_iq), mom_hs, mom_iq], axis=1)
    rng = np.random.default_rng(0)
    mu = beta @ Xg.T                                        # (n, 140)
    pred = mu + sigma[:, None] * rng.standard_normal(mu.shape)
    mean = pred.mean(0)
    lo, hi = np.quantile(pred, [0.05, 0.95], axis=0)
    fig, axes = plt.subplots(1, 2, figsize=(10, 5), sharex=True, sharey=True)
    for ax, hs in zip(axes, (0.0, 1.0)):
        m = mom_hs == hs
        order = np.argsort(mom_iq[m])
        x = mom_iq[m][order]
        ax.plot(x, mean[m][order], color="black", label="prediction")
        ax.fill_between(x, lo[m][order], hi[m][order], alpha=0.3,
                        color="gray", label="90% interval")
        ax.set_xlabel("mom_iq")
        ax.set_title(f"mom_hs = {int(hs)}")
    axes[0].set_ylabel("kid_score")
    axes[0].legend(loc="upper left")
    fig.savefig(out_dir / "kidiq-posterior-predictive.svg",
                bbox_inches="tight")
    plt.close(fig)
    return True


def main(out_dir: str = "img"):
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    made, skipped = [], []
    for tname in ("eight_schools", "diamonds", "kidiq"):
        for kernel in ("arwmh", "asss"):
            for fn, tag in (
                (fig_lr_decay_pe, f"{kernel}-pe-lr-{tname}"),
                (fig_lr_decay_adaptation,
                 f"{kernel}-adaptation-lr-{tname}"),
            ):
                (made if fn(tname, kernel, out) else skipped).append(tag)
        (made if fig_metric_boxplots(out, tname) else skipped).append(
            f"metric-boxplots-{tname}"
        )
    (made if fig_phi_convergence(out) else skipped).append("phi-eight-schools")
    (made if fig_phi_convergence(out, "diamonds") else skipped).append(
        "phi-diamonds"
    )
    (made if fig_kidiq_predictive(out) else skipped).append("kidiq-predictive")
    print(f"made: {made}")
    if skipped:
        print(f"skipped (missing artifacts): {skipped}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "img")
