"""Training-time diagnostic figures (reference utils/plotting.py).

plot_sos: the learned STanH staircase, soft (at the current beta) vs hard,
for one rate level (reference plotting.py:6-65). plot_rate_distorsion: RD
curves (reference plotting.py:79-159). Both return matplotlib figures and
optionally log to wandb when a run is passed.
"""

from __future__ import annotations

import numpy as np


def plot_sos(w: np.ndarray, b: np.ndarray, symmetric: bool, beta: float,
             lv: int = 0, wandb_run=None, span: float | None = None):
    """Figure of soft-vs-hard staircase for quantizer params (w, b)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax.numpy as jnp

    from ..entropy import stanh as sq

    state = sq.derive_state(jnp.asarray(w), jnp.asarray(b), symmetric)
    cw = np.asarray(state.cum_w)
    span = span if span is not None else float(abs(cw).max()) * 1.2 + 1
    x = np.linspace(-span, span, 2001, dtype=np.float32)
    soft = np.asarray(sq.soft_quantize(jnp.asarray(x), state, jnp.float32(beta)))
    hard = np.asarray(sq.hard_quantize(jnp.asarray(x), state, symmetric))

    fig, ax = plt.subplots(figsize=(7, 5))
    ax.plot(x, hard, lw=1.0, label="hard staircase", color="#888")
    ax.plot(x, soft, lw=1.5, label=f"soft (beta={beta:.1f})")
    ax.scatter(cw, cw, s=8, color="crimson", zorder=3, label="levels")
    ax.set_xlabel("input")
    ax.set_ylabel("quantized")
    ax.grid(alpha=0.3)
    ax.legend()
    ax.set_title(f"STanH staircase (level {lv})")
    if wandb_run is not None:
        import wandb

        wandb_run.log({f"sos/level_{lv}": wandb.Image(fig)})
    return fig


def plot_rate_distorsion(bpp_res: dict, psnr_res: dict, epoch: int = 0,
                         wandb_run=None):
    """RD curves from {name: [bpp...]} / {name: [psnr...]} dicts
    (reference plotting.py:79-159)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 6))
    for name in bpp_res:
        if name in psnr_res:
            order = np.argsort(np.asarray(bpp_res[name]))
            ax.plot(
                np.asarray(bpp_res[name])[order],
                np.asarray(psnr_res[name])[order],
                marker="o",
                label=name,
            )
    ax.set_xlabel("bpp")
    ax.set_ylabel("PSNR (dB)")
    ax.grid(alpha=0.3)
    ax.legend()
    ax.set_title(f"rate-distortion (epoch {epoch})")
    if wandb_run is not None:
        import wandb

        wandb_run.log({"rd/curve": wandb.Image(fig), "rd/epoch": epoch})
    return fig
