from prdisagg_tpu.train.state import GANTrainState, create_train_state
from prdisagg_tpu.train.wgan_gp import make_train_step

__all__ = ["GANTrainState", "create_train_state", "make_train_step"]
