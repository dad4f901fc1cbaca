"""pytextgcn_tpu — a TPU-native TextGCN framework (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the capabilities of BeFranke/PyTextGCN
(Yao et al., "Graph Convolutional Networks for Text Classification",
arXiv:1809.05679) for TPU hardware:

* corpus -> heterogeneous word/document graph (TF-IDF doc-word edges,
  sliding-window PMI word-word edges) built by vectorized counting
  (on-device sort/segment ops) with a multithreaded C++ host kernel as the
  native comparison point (reference: textgcn/lib/clib/graphbuilder.pyx),
* 2-layer GCN trained full-batch with masked cross-entropy, with the sparse
  neighborhood aggregation running as a Pallas CSR/tile SpMM kernel
  (reference: torch-geometric GCNConv on torch-scatter kernels),
* flat / per-level hierarchical / per-label ensemble classification heads
  plus TF-IDF+MLP baselines (reference: flat_*.py, perlevel_*.py,
  perlabel_*.py, MLP_*.py experiment drivers),
* multi-chip scaling via `jax.sharding.Mesh` + `shard_map`: edge-partitioned
  SpMM with XLA collectives over ICI.

Public entry points:
    Text2Graph          corpus -> TextGraph transformer
    TextGraph           the graph container (a JAX pytree)
    models.GCN/EGCN/JumpingKnowledgeNetwork/MLP
    train.Trainer       full-batch training engine
"""

__version__ = "0.1.0"

from .utils import tune_allocator

tune_allocator()  # see utils.py: first-touch page faults dominate host-side
# graph/plan builds on lazily-backed VMs unless big buffers stay on the heap

from .core.graph import TextGraph
from .build.text2graph import Text2Graph

__all__ = ["TextGraph", "Text2Graph", "__version__"]


def __getattr__(name):
    # lazy conveniences that pull in jax-heavy modules only on use
    if name == "Trainer":
        from .train.trainer import Trainer

        return Trainer
    if name == "models":
        from . import models

        return models
    raise AttributeError(name)
