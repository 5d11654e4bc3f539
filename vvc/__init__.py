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

# Platform override hook: the container's sitecustomize force-registers the
# TPU backend regardless of JAX_PLATFORMS; VVC_JAX_PLATFORM=cpu lets tests
# and CI subprocesses pin the CPU backend explicitly.
import os as _os

if _os.environ.get("VVC_JAX_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["VVC_JAX_PLATFORM"])
if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ["JAX_COMPILATION_CACHE_DIR"])
