from . import stft
from . import complex_layers
from . import complex_lstm
from . import complex_bn
