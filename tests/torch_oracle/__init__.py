"""End-to-end PyTorch oracle for the reference TCM.

`compressai_stub` vendors the minimal CompressAI module semantics (entropy
models + layers) in torch, and `load_reference` imports the reference's own
model code from /root/reference (read-only, executed in place — never
copied) against those stubs. Tests use this to run the reference TCM
forward at matched converted weights and gate the JAX implementation's
bpp/PSNR against it (BASELINE.md "RD fidelity within 0.1%").
"""
