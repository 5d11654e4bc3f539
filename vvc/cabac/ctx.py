"""Context model sets for slice-level CABAC state.

TPU-native analog of the reference's context tables
(`/root/reference/source/Lib/CommonLib/Contexts.cpp` → ContextSetCfg, one
CtxSet per syntax-element family; ContextModelling.h → CoeffCodingContext).

[verify]: per-context init values / adaptation rates are uniform
placeholders until /root/reference is populated (SURVEY.md §0).  Both
encoder and decoder construct contexts from this registry, so streams stay
self-consistent; only compression efficiency is affected.
"""
from __future__ import annotations

from vvc.cabac.engine import ContextModel

# (name, count) — mirrors the CtxSet families of the reference needed for
# the intra/QT slice (more are added as tools land)
CTX_SETS = [
    ("SPLIT_CU_FLAG", 3),
    ("INTRA_LUMA_REF_IDX", 2),
    ("INTRA_LUMA_MPM_FLAG", 1),
    ("INTRA_LUMA_NOT_PLANAR", 2),
    ("INTRA_CHROMA_PRED_MODE", 1),
    ("CBF_LUMA", 4),
    ("CBF_CB", 2),
    ("CBF_CR", 3),
    ("LAST_X_LUMA", 20),
    ("LAST_Y_LUMA", 20),
    ("LAST_X_CHROMA", 3),
    ("LAST_Y_CHROMA", 3),
    ("SB_CODED_FLAG_LUMA", 2),
    ("SB_CODED_FLAG_CHROMA", 2),
    ("SIG_LUMA", 12),
    ("SIG_CHROMA", 8),
    ("GT1_LUMA", 16),
    ("GT1_CHROMA", 5),
    ("PAR_LUMA", 16),
    ("PAR_CHROMA", 5),
    ("GT3_LUMA", 16),
    ("GT3_CHROMA", 5),
]


class SliceContexts:
    """All adaptive contexts of one slice (reference: Ctx / CtxStore).

    Access: ctx("SIG_LUMA", 7) → ContextModel.
    """

    def __init__(self, slice_qp: int = 32):
        self._sets = {}
        for name, count in CTX_SETS:
            # placeholder uniform init (state 64 = p=0.5); qp-dependent spec
            # init tables slot in here [verify]
            self._sets[name] = [ContextModel(64) for _ in range(count)]

    def __call__(self, name: str, idx: int) -> ContextModel:
        return self._sets[name][idx]

    def set_size(self, name: str) -> int:
        return len(self._sets[name])
