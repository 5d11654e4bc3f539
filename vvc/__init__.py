"""vvc — a TPU-native H.266/VVC encoder/decoder framework (JAX/XLA/Pallas).

Built from scratch against the behavior of the reference codebases
VVCSoftware_VTM (JVET reference software) and OpenVVC (real-time decoder);
see /root/repo/SURVEY.md for the full structural blueprint and the mapping
from every reference component to its TPU-native equivalent here.

Architecture tenets (SURVEY.md §7.0):
  * SoA tensors batched over a CTU/block axis — no CU/PU/TU object graph.
  * Enumerate–mask–reduce RDO, not recursive search.
  * One kernel set serves encoder reconstruction and decoder (the VTM
    CommonLib invariant, source/Lib/CommonLib → vvc.kernels).
  * CABAC arithmetic coding runs on the host (vvc.cabac engine + native
    packer); bin modeling / rate estimation is device-friendly.
  * Normative paths are integer-only (int32/int64).
"""

__version__ = "0.1.0"
