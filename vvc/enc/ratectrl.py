"""Rate control: R-λ model with per-picture bit allocation.

TPU-native analog of the reference's rate control
(`/root/reference/source/Lib/EncoderLib/RateCtrl.cpp` → RateCtrl +
EncRCSeq/EncRCGOP/EncRCPic, the JCTVC-K0103 R-λ lineage: λ = α·bpp^β,
per-picture allocation by hierarchy weight, α/β adaptation after each
picture).  CTU-level allocation is deferred ([verify]); picture-level is
what the config-4 gate exercises.

All state is two floats per hierarchy level (α, β) plus the bit budget —
explicitly checkpointable (SURVEY.md §5.4: RC state is the only cross-GOP
mutable encoder state besides the DPB).
"""
from __future__ import annotations

import math

# hierarchy-level weights for bit allocation (reference: EncRCGOP's
# adaptive ratios — static simplification [verify])
LEVEL_WEIGHT = {0: 1.0, 1: 0.6, 2: 0.45, 3: 0.35, 4: 0.3, 5: 0.28}
INTRA_WEIGHT = 5.0


def qp_from_lambda(lam: float) -> int:
    """QP = 4.2005·ln λ + 13.7122 (reference: EncRCPic, K0103 eq.)."""
    return int(round(4.2005 * math.log(max(lam, 1e-6)) + 13.7122))


class RateCtrl:
    """Sequence-level R-λ controller.

    Usage per picture (coding order):
        qp, lam = rc.pic_qp(slice_type, tid, n_pix)
        ... encode with qp ...
        rc.update(slice_type, tid, bits, n_pix, lam)
    """

    def __init__(self, target_kbps: float, fps: float, n_frames: int,
                 base_qp: int = 32, avg_weight: float = 0.55):
        self.bits_per_frame = target_kbps * 1000.0 / fps
        self.frames_left = n_frames
        self.bits_left = self.bits_per_frame * n_frames
        self.base_qp = base_qp
        # mean allocation weight over the sequence's actual GOP structure
        # (the caller computes it from the entry list) — a flat low-delay
        # sequence has mean 1.0, hierarchical-B ≈ 0.5; normalizing by the
        # true mean keeps Σ targets == budget instead of systematically
        # overspending (reference: EncRCGOP equal-sum allocation)
        self.avg_weight = avg_weight
        # per-(is_intra, tid) model state
        self.alpha = {}
        self.beta = {}
        self.n_updates = {}
        self.last_qp = base_qp
        self.last_intra_qp = None
        self.spent = 0.0
        self.frames_done = 0

    def _model(self, key):
        if key not in self.alpha:
            self.alpha[key] = 3.2003 if not key[0] else 6.7542
            self.beta[key] = -1.367 if not key[0] else -1.7860
        return self.alpha[key], self.beta[key]

    def _weight(self, slice_type: int, tid: int) -> float:
        if slice_type == 2:
            return INTRA_WEIGHT
        return LEVEL_WEIGHT.get(tid, 0.3)

    def pic_qp(self, slice_type: int, tid: int, n_pix: int,
               window: int = 16):
        """Target bits → λ → QP for the next picture."""
        avg = self.bits_left / max(1, self.frames_left)
        w = self._weight(slice_type, tid)
        target = max(avg * w / self.avg_weight, 100.0)
        bpp = target / n_pix
        a, b = self._model((slice_type == 2, min(tid, 5)))
        lam = a * (bpp ** b)
        lam = min(max(lam, 0.1), 10000.0)
        qp = qp_from_lambda(lam)
        # closed-loop budget feedback: accumulated over/under-spend maps
        # to a QP bias through the same λ→QP slope, bounding model-lag
        # drift (the open-loop R-λ model alone walks the budget on
        # content its α/β have not adapted to yet)
        if self.frames_done >= 2:
            ratio = self.spent / (self.bits_per_frame * self.frames_done)
            bias = 4.2005 * math.log(max(ratio, 1e-3))
            qp += int(round(min(max(bias, -6.0), 6.0)))
        qp = min(max(qp, self.last_qp - 3), self.last_qp + 3)
        if (slice_type != 2 and self.last_intra_qp is not None
                and self.n_updates.get((False, min(tid, 5)), 0) < 3):
            # an UNTRAINED inter model over-allocates the first P/Bs of
            # its layer; floor them at the intra anchor until the model
            # has a few real updates
            qp = max(qp, self.last_intra_qp + min(tid, 2) - 1)
        qp = min(max(qp, 1), 63)   # codec QP range is 0..63 in VVC
        self._pending_qp = qp
        return qp, lam

    def update(self, slice_type: int, tid: int, bits: float, n_pix: int,
               lam_used: float):
        """α/β adaptation from actual bits (reference:
        EncRCPic::updateAfterPicture)."""
        key = (slice_type == 2, min(tid, 5))
        a, b = self._model(key)
        bpp_real = max(bits / n_pix, 1e-7)
        lam_comp = a * (bpp_real ** b)
        d = math.log(lam_used) - math.log(max(lam_comp, 1e-9))
        # adaptation gain schedule: an untrained model can be 10× off on
        # unseen content — correct hard for the first updates, then settle
        # to the reference's gentle tracking (EncRCPic updateAfterPicture)
        n_up = self.n_updates.get(key, 0)
        g = 0.5 if n_up < 3 else (0.25 if n_up < 8 else 0.10)
        if bpp_real < 0.05:
            # near-zero-bpp pictures (deep-B layers on easy content) sit
            # outside the R-λ model's domain — fast gains there collapse
            # α and turn the smallest-target frames into the biggest
            # spenders; keep the gentle track
            g = 0.10
        self.alpha[key] = min(max(a * math.exp(g * d), 0.05), 500.0)
        # β stays on the gentle K0103 track — fast β swings collapse the
        # deep-layer models (β→-0.1 turned tiny-target B frames into the
        # biggest spenders)
        self.beta[key] = min(max(b + 0.05 * d * math.log(bpp_real), -3.0),
                             -0.1)
        self.n_updates[key] = self.n_updates.get(key, 0) + 1
        self.bits_left -= bits
        self.frames_left -= 1
        self.spent += bits
        self.frames_done += 1
        self.last_qp = getattr(self, "_pending_qp", qp_from_lambda(lam_used))
        if slice_type == 2:
            self.last_intra_qp = self.last_qp

    def state(self):
        """Checkpointable RC state (SURVEY.md §5.4)."""
        return {"alpha": dict(self.alpha), "beta": dict(self.beta),
                "bits_left": self.bits_left, "frames_left": self.frames_left,
                "last_qp": self.last_qp}
