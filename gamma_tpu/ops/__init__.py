"""Device-side numeric ops (JAX/XLA + Pallas).

Everything in this package is pure-functional and jit-safe: fixed shapes,
no data-dependent Python control flow.  Host code in engine/ decides
*what* to launch; these ops are the data plane.
"""
