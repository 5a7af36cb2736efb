"""Graph construction + multi-graph-matching core (TPU-native).

This package re-designs the reference's ``adapteacher/modeling/GModule``
(reference ``multi_graph_matching.py``, ``build_graph.py``, ``utils/``) as
fixed-shape, mask-aware JAX/Flax numerics:

* ragged per-image node lists become ``(G, M, D)`` tensors with validity
  masks (nodes compacted to the front of each row),
* the iterative solvers (HiPPI, GA-GM) are ``lax.while_loop`` programs under
  ``stop_gradient`` — matching the reference's effective gradient semantics,
  where the final Hungarian projection severs gradients,
* every pairwise loop (affinity blocks, permutation losses) is a batched
  einsum over all graph pairs at once.
"""

from ttdg_mgm_tpu.graph.attention import MultiHeadAttention, dot_attention
from ttdg_mgm_tpu.graph.affinity import Affinity
from ttdg_mgm_tpu.graph.gcn import Feat2Graph, GraphConvolution, MAGNN
from ttdg_mgm_tpu.graph.losses import (
    BCEFocalLoss,
    permutation_loss,
    cross_entropy_perm_loss,
    hamming_loss,
    inner_product_loss,
)
from ttdg_mgm_tpu.graph.node_sampler import PrototypeComputation
from ttdg_mgm_tpu.graph.solvers import hippi, ga_gm
from ttdg_mgm_tpu.graph.universe import GUniverse, USup
from ttdg_mgm_tpu.graph.mgm import MGM3Unsup
