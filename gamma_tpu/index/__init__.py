"""Retrieval models (the plugin layer).

Reference: index/retrieval_model.h RetrievalModel ABC + the Reflector
registry (index/reflector.h:27-80 REGISTER_MODEL).  Importing this package
registers the built-in models.
"""

from gamma_tpu.index import registry
from gamma_tpu.index.registry import register_model, create_model, model_names
from gamma_tpu.index.model import RetrievalModel

# built-ins register on import — every reference retrieval_type is a
# real implementation (FLAT / IVFPQ / IVFPQ_FASTSCAN / IVFFLAT /
# BINARYIVF / HNSW / SCANN+VEARCH)
from gamma_tpu.index import flat as _flat          # noqa: F401
from gamma_tpu.index import ivfpq as _ivfpq        # noqa: F401
from gamma_tpu.index import ivfpq_fastscan as _fs  # noqa: F401
from gamma_tpu.index import ivfflat as _ivfflat    # noqa: F401
from gamma_tpu.index import binary_ivf as _bivf    # noqa: F401
from gamma_tpu.index import hnsw as _hnsw          # noqa: F401
from gamma_tpu.index import scann as _scann        # noqa: F401

__all__ = ["register_model", "create_model", "model_names", "RetrievalModel"]
