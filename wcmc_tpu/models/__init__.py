from wcmc_tpu.models.blocks import ConvChain, UNet
from wcmc_tpu.models.pathnet import PathNet
from wcmc_tpu.models.kpcn import KPCN
from wcmc_tpu.models.sbmc import Multisteps
from wcmc_tpu.models.lbmc import LayerNet
