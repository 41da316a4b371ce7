from . import metrics
from .metrics import subgrid_scores, PDF_histogram
