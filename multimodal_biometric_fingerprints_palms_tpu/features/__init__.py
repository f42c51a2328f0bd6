from .minutiae import extract_minutiae, MinutiaeSet
from .quality import postprocess_minutiae
