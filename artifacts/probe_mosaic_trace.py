"""Capture FULL Mosaic lowering tracebacks for the fused conv kernels.

Round 3's bench reported only "fused convs failed to lower/verify
(MosaicError); disabled" — the traceback was swallowed, so the v5e
lowering bug is still undiagnosed. This probe compiles each kernel at a
tiny shape directly on the chip and prints the complete error, plus a
numerics check when a kernel does lower. Budget: ~2 min. Run as the
first TPU-queue step so one tunnel blink yields the diagnosis.
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}", flush=True)

    from reslic_tcm_tpu.ops import fused_conv as fc

    rng = np.random.default_rng(0)
    C = 128
    x = jnp.asarray(rng.normal(size=(1, 16, 16, C)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.bfloat16)
    gamma = jnp.asarray(rng.uniform(0.01, 0.1, size=(C, C)), jnp.float32)
    beta = jnp.asarray(rng.uniform(0.5, 1.5, size=(C,)), jnp.float32)
    skip = jnp.asarray(rng.normal(size=(1, 16, 16, C)), jnp.bfloat16)

    def attempt(name, fn):
        print(f"\n=== {name}", flush=True)
        try:
            got = np.asarray(fn(interpret=False), np.float32)
            ref = np.asarray(fn(interpret=True), np.float32)
            err = np.max(np.abs(got - ref))
            print(f"{name}: LOWERED+RAN, max|chip-interpret|={err:.5f}",
                  flush=True)
        except Exception:
            traceback.print_exc()
            sys.stdout.flush()

    attempt(
        "fused_residual_block",
        lambda interpret: fc.fused_residual_block(
            x, w1, b1, w2, b2, interpret=interpret),
    )
    attempt(
        "fused_conv_gdn",
        lambda interpret: fc.fused_conv_gdn(
            x, w1, b1, gamma, beta, skip, interpret=interpret),
    )
    attempt(
        "fused_conv_igdn",
        lambda interpret: fc.fused_conv_gdn(
            x, w1, b1, gamma, beta, skip, inverse=True, interpret=interpret),
    )


if __name__ == "__main__":
    main()
