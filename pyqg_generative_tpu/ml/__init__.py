from . import nets, scalers, train
from .scalers import ChannelwiseScaler
