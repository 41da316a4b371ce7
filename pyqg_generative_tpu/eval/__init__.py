from . import metrics, comparison
from .metrics import subgrid_scores, PDF_histogram
from .comparison import (diagnostic_differences, distrib_score,
                         spectral_score, coarsegrain_reference_dataset,
                         dataset_statistics, dataset_smart_read)
