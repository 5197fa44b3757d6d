from .wav import read_wav, write_wav
from .synthetic import SyntheticEnhancementDataset
from .librimix import LibriMixDataset
from .dns import DNSDataset
from .loader import make_loader
