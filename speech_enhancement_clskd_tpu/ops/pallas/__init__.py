from .gram import gram_pair, spkd_pallas_available
