"""Retrieval models (the plugin layer).

Reference: index/retrieval_model.h RetrievalModel ABC + the Reflector
registry (index/reflector.h:27-80 REGISTER_MODEL).  Importing this package
registers the built-in models.
"""

from gamma_tpu.index import registry
from gamma_tpu.index.registry import register_model, create_model, model_names
from gamma_tpu.index.model import RetrievalModel

# built-ins register on import
from gamma_tpu.index import flat as _flat          # noqa: F401
from gamma_tpu.index import ivfpq as _ivfpq        # noqa: F401
from gamma_tpu.index import ivfflat as _ivfflat    # noqa: F401
from gamma_tpu.index import binary_ivf as _bivf    # noqa: F401
from gamma_tpu.index import hnsw as _hnsw          # noqa: F401

# Aliases for the reference's remaining retrieval_types: their purpose —
# SIMD-register LUT scans (IVFPQ_FastScan) and the external ScaNN engine
# (VEARCH, index/impl/scann/) — is fulfilled on TPU by IVFPQ's dense
# MXU scan mode (see gamma_tpu/index/ivfpq.py docstring).
_REG = _ivfpq.IVFPQIndex
registry._REGISTRY.setdefault("IVFPQ_FASTSCAN", _REG)
registry._REGISTRY.setdefault("VEARCH", _REG)
registry._REGISTRY.setdefault("SCANN", _REG)

__all__ = ["register_model", "create_model", "model_names", "RetrievalModel"]
