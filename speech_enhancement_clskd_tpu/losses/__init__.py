from .signal import sdr, si_snr, si_sdr, rmse
from .spectral import (
    spectral_convergence,
    log_stft_magnitude,
    stft_loss,
    multi_resolution_stft_loss,
)
from .mel import mel_filterbank, perceptual_distance, array_mel_loss
from .kd import spkd_loss, hcl
from .modes import dccrn_loss
from .pit import (
    pairwise_neg_si_sdr,
    pit_from_pw_mtx,
    pit_reorder,
    pit_si_sdr_loss,
)
