"""Standalone mini-UNet — parity with the reference's top-level `model.py`
(86 LoC, the `data.py`/`loss.py` mini-pipeline's model, unused by the main
trainer). Thin alias over the zoo UNet."""

from mm_unet_tpu.models.unet import UNet


def Unet(num_classes: int = 1, n_channels: int = 3) -> UNet:
    return UNet(n_channels=n_channels, num_classes=num_classes)
