from wcmc_tpu.train.state import ModelState, init_model_state
from wcmc_tpu.train.interfaces import (
    BaseInterface,
    KPCNInterface,
    KPCNRefInterface,
    KPCNPreInterface,
    SBMCInterface,
    LBMCInterface,
)
