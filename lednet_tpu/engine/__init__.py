from lednet_tpu.engine.checkpoint import (find_latest_checkpoint,
                                          load_checkpoint, save_checkpoint)
from lednet_tpu.engine.optim import build_lr_schedule, build_optimizer
from lednet_tpu.engine.runner import Runner
from lednet_tpu.engine.state import (TrainState, create_train_state,
                                     make_eval_step, make_train_step,
                                     parse_losses)
