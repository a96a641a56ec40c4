"""Host-side data pipelines (numpy/PIL), seeded and deterministic.

Loader selection follows the reference (`train.py:174-178`,
`verify.py:133-144`): DRIVE/STARE -> vessel loader; CVC_ClinicDB/Kvasir_SEG ->
polyp loader; EDD_seg -> 5-class EDD loader; Sun_seg -> video-frame loader.
"""

from mm_unet_tpu.data.loaders import get_dataloader

__all__ = ["get_dataloader"]
