"""Device placement helpers.

Model initialization runs on CPU (eager init on the tunneled TPU costs
minutes; CPU init takes seconds) and parameters are then transferred to the
default backend in one host->device copy.
"""

from __future__ import annotations

import jax


def init_on_cpu(module, rngs, *args, **kwargs):
    """module.init on the CPU backend; result moved to the default device.

    Inputs (and rngs) are placed on CPU first — eager ops follow operand
    placement, so a TPU-resident example input would drag the whole eager
    init onto the accelerator."""
    cpu = jax.devices("cpu")[0]
    args = jax.device_put(args, cpu)
    rngs = jax.device_put(rngs, cpu)
    with jax.default_device(cpu):
        # eager on purpose: jitting init would compile the full forward graph
        # (minutes for the big models); eager CPU init is seconds
        variables = module.init(rngs, *args, **kwargs)
    default = jax.devices()[0]
    if default.platform != "cpu":
        variables = jax.device_put(variables, default)
    return variables
