from .schedule import cosine_warmup_schedule
from .ssl_train import train_ssl, create_ssl_train_step, SSLTrainState
