from .logging import console_step, get_file_logger
from .padding import pad_to_multiple, canonical_shape
