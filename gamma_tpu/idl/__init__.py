from gamma_tpu.idl import wire  # noqa: F401
