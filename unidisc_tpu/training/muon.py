"""Muon optimizer routing for the DIT/ELM parameter trees.

Muon (momentum orthogonalized by Newton-Schulz) is steepest descent
under the spectral norm: the momentum buffer of each hidden MATRIX is
orthogonalized with a 5-step Newton-Schulz iteration before being
applied. The NS iteration is three matmuls per step in bf16 — it runs
on the MXU, which makes Muon unusually cheap on TPU (the per-step
overhead is a few extra (K,N)x(N,K)-class dots per hidden matrix).

No reference counterpart: the reference's optimizer zoo is
AdamW/Adafactor/AdEMAMix (model_setup.py:385-433). We reuse
optax.contrib.muon (the algorithm; optax >= 0.2.6) and supply the
piece that is model-specific — WHICH leaves are hidden matrices and
what their matrix axes are:

  * trunk block kernels are SCAN-STACKED: (n_blocks, K, N) — axis 0 is
    a batch axis, so the NS iteration must vmap over it
    (MuonDimensionNumbers(reduction_axis=1, output_axis=2));
  * MoE expert stacks (blocks/moe/w1|w2) are (E, K, N) — same shape
    rule, batched over experts;
  * embeddings, the vocab head, norms, biases, adaLN vectors and the
    timestep MLP fall through to the embedded Adam (the standard Muon
    recipe: Muon for hidden matrices, AdamW for everything else).

A leaf is a hidden matrix iff it lives under the `blocks` subtree AND
is a dense kernel (`kernel` leaf of a Dense module, possibly
scan-stacked) or a stacked MoE expert weight (`w1`/`w2`). Structure
alone is not enough: scan-stacked BIASES are (n_blocks, N) — 2D but
not matrices — so routing keys on the leaf name. The fp32 MoE router
stays on Adam (Switch routers are update-sensitive; the standard Muon
recipe keeps small/IO layers on AdamW anyway).
"""

from __future__ import annotations

import jax
from optax.contrib import MuonDimensionNumbers

_MATRIX_LEAVES = ("kernel", "w1", "w2")


def muon_dimension_numbers(params):
    """params tree -> MuonDimensionNumbers tree (None = Adam leaf).

    Pass as optax.contrib.muon(muon_weight_dimension_numbers=...).
    """
    def route(path, p):
        keys = [getattr(s, "key", "") for s in path]
        if "blocks" not in keys:
            return None  # embeddings / head / timestep MLP / final layer
        if not keys or keys[-1] not in _MATRIX_LEAVES:
            return None  # biases, norm scales, the fp32 MoE router
        nd = getattr(p, "ndim", 0)
        if nd < 2:
            return None
        # last two axes are (reduction K, output N); any leading axes
        # (scan-stacked n_blocks, MoE expert E) are implicit batch axes
        return MuonDimensionNumbers(reduction_axis=nd - 2,
                                    output_axis=nd - 1)

    return jax.tree_util.tree_map_with_path(route, params)
