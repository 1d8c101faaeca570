"""Minimal `torchvision` shim for running the reference on CPU.

The reference imports `torchvision.transforms` at dataset-module scope
(/root/reference/dataset/kitti_mot.py:13) but only exercises it on the
'vis' feature path (Resize/ToTensor/Normalize in get_embed_net_outputs,
kitti_mot.py:369-380).  The three transforms are implemented for real
(PIL + torch) so even the vis path works without the package.
"""

from . import transforms  # noqa: F401
