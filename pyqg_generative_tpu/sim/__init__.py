from . import simulate, stochastic
from .simulate import (run_simulation, run_ensemble,
                       run_ensemble_segmented,
                       generate_subgrid_forcing,
                       generate_subgrid_forcing_batch, set_initial_condition,
                       init_run_carry, advance_run, run_with_snapshots)
