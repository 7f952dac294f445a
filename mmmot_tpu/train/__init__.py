from mmmot_tpu.train.losses import tracking_loss
from mmmot_tpu.train.trainer import (TrainState, build_optimizer,
                                     create_train_state, train_step)
