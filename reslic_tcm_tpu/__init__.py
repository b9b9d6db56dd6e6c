"""reslic-tpu: TPU-native learned image compression framework.

A from-scratch JAX/XLA/Pallas rebuild of the LIC-TCM research stack
(reference: AlbertoPresta/ResLIC_TCM) — see README.md and docs/PARITY.md.
"""

__version__ = "0.1.0"

__all__ = [
    "models",
    "entropy",
    "coding",
    "ops",
    "training",
    "parallel",
    "data",
    "utils",
]
