from pvn3d_tpu.models.pvn3d import PVN3D  # noqa: F401
from pvn3d_tpu.models.losses import focal_loss, offset_l1_loss  # noqa: F401
