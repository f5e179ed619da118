"""Experiment runners: w_eval and lr_decay sweeps.

The reference runs 100 seeds x 3 kernels as sequential Python loops over
full MCMC runs (run_eight_schools_wasserstein.py:60-70 — hours of CPU).
TPU-native shape: the seed axis IS a chain axis.  One batched run executes
all seeds simultaneously (each "chain" = one seed's independent chain,
sharded over the mesh), so a 100-seed sweep costs one program launch.

Outputs land as .npz per (target, kernel): thinned samples
(seeds, draws, dim) + extra-field trajectories + config JSON, with a
SweepManifest for restartability."""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Callable, Dict, Optional

import jax
import numpy as np

from adaptive_mcmc_tpu import models as _models
from adaptive_mcmc_tpu import kernels as _kernels
from adaptive_mcmc_tpu.experiments.configs import LR_DECAYS, RunConfig
from adaptive_mcmc_tpu.infer.collect import collect_states_logscale
from adaptive_mcmc_tpu.utils.checkpoint import SweepManifest

TARGETS: Dict[str, Callable] = {
    "eight_schools": _models.eight_schools_noncentered,
    "eight_schools_centered": _models.eight_schools_centered,
    "diamonds": _models.diamonds,
    "kidiq": _models.kidiq,
}


def _driver_name(kernel, kernel_name: str) -> str:
    """Which driver run_mcmc_sharded will pick for this kernel + the
    w_eval extra_fields (provenance stamp for the saved npz)."""
    fields = {"position", "potential_energy"}
    if kernel_name in ("arwmh", "rwm", "asss"):
        fields.add("as_change")
    if getattr(kernel, "collect_n", None) is not None and fields <= set(
        getattr(kernel, "collect_fields", ())
    ):
        return "collect_n"
    if getattr(kernel, "step_n", None) is not None:
        return "step_n"
    return "lockstep"


def _unroll_override(cfg_cls) -> dict:
    """Optional AMT_PIPELINE_UNROLL env override for the pipelined
    drivers' body-unroll factor (scripts/tune_unroll.py measures the
    best value per chip; the dataclass default is the fallback)."""
    import os

    v = os.environ.get("AMT_PIPELINE_UNROLL")
    if v and "pipeline_unroll" in getattr(
        cfg_cls, "__dataclass_fields__", {}
    ):
        return {"pipeline_unroll": int(v)}
    return {}


def build_kernel(name: str, target, *, lr_decay: float, num_warmup: int):
    if name in ("arwmh", "rwm"):
        cfg = _kernels.ARWMHConfig(
            lr_decay=lr_decay, num_warmup=num_warmup,
            adapt=(name == "arwmh"),
        )
        return _kernels.arwmh(target, cfg)
    if name == "asss":
        cfg = _kernels.ASSSConfig(
            lr_decay=lr_decay, num_warmup=num_warmup,
            **_unroll_override(_kernels.ASSSConfig),
        )
        return _kernels.asss(target, cfg)
    if name == "nuts":
        from adaptive_mcmc_tpu.kernels.nuts import NUTSConfig, nuts

        return nuts(target, NUTSConfig(
            num_warmup=num_warmup, **_unroll_override(NUTSConfig),
        ))
    if name == "sa":
        from adaptive_mcmc_tpu.kernels.sa import SAConfig, sa

        return sa(target, SAConfig(num_warmup=num_warmup))
    raise ValueError(f"unknown kernel {name!r}")


def run_w_eval(config: RunConfig, verbose: bool = True) -> Path:
    """Run the w_eval experiment for one (target, kernel): all seeds as one
    sharded chain batch; save thinned draws + PE + adapt-state trajectory
    summary."""
    from adaptive_mcmc_tpu.parallel import chain_mesh, run_mcmc_sharded

    out_dir = Path(config.out_dir) / "w_eval" / config.target
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / f"{config.kernel}.npz"
    manifest = SweepManifest(out_dir / "manifest.json")
    key = f"{config.kernel}"
    if manifest.is_done(key) and out_path.exists():
        if verbose:
            print(f"[skip] {out_path} already complete")
        return out_path

    target = TARGETS[config.target]()
    kernel = build_kernel(
        config.kernel, target,
        lr_decay=config.lr_decay, num_warmup=config.num_warmup,
    )
    n_chains = config.n_seeds * config.chains_per_seed
    mesh = chain_mesh(config.mesh_devices)
    # pad chains to a mesh multiple
    n_dev = mesh.devices.size
    n_padded = ((n_chains + n_dev - 1) // n_dev) * n_dev

    rng_key = jax.random.PRNGKey(config.seed0)
    t0 = time.time()
    # bound single device executions (long scans trip device watchdogs)
    max_steps = {"nuts": 20_000, "sa": 50_000}.get(config.kernel, 500_000)
    F = max(1, config.fan_out)
    samples, extras, last = run_mcmc_sharded(
        kernel,
        rng_key,
        config.num_warmup,
        config.num_samples,
        thinning=config.thinning,
        n_chains=n_padded,
        mesh=mesh,
        max_steps_per_call=max_steps,
        fan_out=F,
        extra_fields=("potential_energy", "as_change")
        if kernel.name in ("arwmh", "rwm", "asss")
        else ("potential_energy",),
    )
    jax.block_until_ready(samples)
    wall = time.time() - t0

    def _per_seed(a):
        """(frames, n_padded*F, ...) -> (seeds, frames*F, ...): clones are
        contiguous per chain; pooled into the seed's draw axis."""
        a = np.asarray(a)
        a = a.reshape(a.shape[0], n_padded, F, *a.shape[2:])[:, :n_chains]
        a = np.moveaxis(a, 0, 1)  # (seeds, frames, F, ...)
        return a.reshape(a.shape[0], -1, *a.shape[3:])

    total_iters = (config.num_warmup + config.num_samples) * n_chains
    meta = {
        "config": json.loads(config.to_json()),
        "wall_seconds": wall,
        "chain_iters_per_sec": total_iters / wall,
        # provenance stamp: which step driver generated these draws
        # (pipelined in-driver collector / pipelined step_n scan / plain
        # lockstep scan) — eval rows must be computed from draws with the
        # same stamp (ADVICE r2 #4).  Mirrors run_mcmc_sharded's choice.
        "driver": _driver_name(kernel, config.kernel),
    }
    np.savez_compressed(
        out_path,
        samples=_per_seed(samples),  # (seeds, draws, dim)
        potential_energy=_per_seed(extras["potential_energy"]),
        meta=json.dumps(meta),
    )
    manifest.mark_done(key)
    if verbose:
        print(
            f"[done] {out_path}: {total_iters / wall:,.0f} chain-iters/s "
            f"({wall:.1f}s)"
        )
    return out_path


def run_lr_decay(
    target_name: str,
    kernel_name: str,
    *,
    n_pow: int = 6,
    n_seeds: int = 100,
    lr_decays=LR_DECAYS,
    out_dir: str = "mcmc_runs",
    seed0: int = 0,
    verbose: bool = True,
):
    """Log-scale state-trajectory sweep (run_*_lr_decay.py): for each
    lr_decay, ONE batched run carries all seeds; saves position / PE /
    as_change trajectories on the log grid, plus a small committable
    summary CSV (experiments/summaries.py) of across-seed quantiles —
    the durable numeric evidence behind the lr-decay figures.

    Skip predicates are artifact-keyed (not manifest-only): a cell is
    complete iff its summary CSV is on disk; a surviving npz with a
    missing summary is backfilled without re-running the sweep."""
    from adaptive_mcmc_tpu.experiments.summaries import (
        summary_path_for,
        write_lr_decay_summary,
    )

    target = TARGETS[target_name]()
    base = Path(out_dir) / "lr_decay" / target_name / kernel_name
    manifest = SweepManifest(base / "manifest.json")
    out_paths = []
    for lr_decay in lr_decays:
        tag = f"{lr_decay:.4g}"
        out_path = base / f"decay_{tag}.npz"
        summary = summary_path_for(out_path)
        if manifest.is_done(tag) and summary.exists():
            out_paths.append(out_path)
            continue
        if out_path.exists() and not summary.exists():
            # trajectories survived but the summary didn't (pre-round-5
            # artifact layout): derive it, don't re-run 10^n_pow steps
            write_lr_decay_summary(
                out_path,
                {"target": target_name, "kernel": kernel_name,
                 "lr_decay": tag, "n_pow": n_pow, "backfilled": True},
            )
            manifest.mark_done(tag)
            out_paths.append(out_path)
            continue
        kernel = build_kernel(
            kernel_name, target, lr_decay=lr_decay, num_warmup=0
        )
        # bound device-program length: the remote worker's watchdog kills
        # multi-minute programs (observed on diamonds ASSS decade-6
        # segments); ASSS steps cost ~5-10x ARWMH's, so cap tighter
        cap = 40_000 if kernel_name == "asss" else 200_000
        t0 = time.time()
        states, _ = collect_states_logscale(
            kernel, jax.random.PRNGKey(seed0), n_pow=n_pow,
            n_chains=n_seeds, max_steps_per_call=cap,
        )
        jax.block_until_ready(states.position)
        wall = time.time() - t0
        base.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            out_path,
            i=np.asarray(states.i),
            position=np.asarray(states.position),
            potential_energy=np.asarray(states.potential_energy),
            as_change=np.asarray(states.as_change),
        )
        write_lr_decay_summary(
            out_path,
            {"target": target_name, "kernel": kernel_name,
             "lr_decay": tag, "n_pow": n_pow,
             "wall_seconds": f"{wall:.2f}"},
        )
        manifest.mark_done(tag)
        if verbose:
            print(f"[done] {out_path} ({wall:.1f}s)")
        out_paths.append(out_path)
    return out_paths
