from .base import Wavelet
from . import families  # noqa: F401  (registers morlet/bump/cmhat/hhhat)
from . import gmw as _gmw_mod  # noqa: F401  (registers gmw)
from .gmw import morsefreq, morsewave, morseafun, laguerre, gmw_k_constants
from .props import (center_frequency, freq_resolution, time_resolution,
                    find_maximum, find_first_occurrence)
from .adm import adm_cwt, adm_ssq, integrate_analytic

__all__ = [
    "Wavelet", "morsefreq", "morsewave", "morseafun", "laguerre",
    "gmw_k_constants", "center_frequency", "freq_resolution",
    "time_resolution", "find_maximum", "find_first_occurrence",
    "adm_cwt", "adm_ssq", "integrate_analytic",
]
