"""Minimal end-to-end demo: STFT round trip + synchrosqueezed CWT.

Mirrors the reference README example (100 Hz sine @ 1 kHz).
Run: python examples/readme_example.py
"""
import numpy as np

from ssqueeze_rs_tpu import (stft, istft, ssq_cwt, issq_cwt, mad_rms,
                             extract_ridges)

fs = 1000.0
t = np.arange(1000) / fs
x = np.cos(2 * np.pi * 100 * t)

# STFT round trip (BASELINE config 1)
Sx = stft(x, window="hann", n_fft=256, hop_len=64)
xr = np.asarray(istft(Sx, window="hann", n_fft=256, hop_len=64, N=len(x)))
err = mad_rms(x, xr)
snr = 10 * np.log10(np.mean(x**2) / np.mean((x - xr) ** 2))
print(f"STFT round trip: mad_rms={err:.2e}, SNR={snr:.1f} dB")

# synchrosqueezed CWT + inversion + ridge
wav = ("gmw", {"beta": 8.0})
Tx, Wx, ssq_freqs, scales = ssq_cwt(x, wav, fs=fs)
xrec = np.asarray(issq_cwt(Tx, wav))
print(f"ssq_cwt shape {Tx.shape}; issq_cwt mad_rms={mad_rms(x, xrec):.3f}")

ridge = extract_ridges(Wx, scales, penalty=2.0)
print(f"ridge rows (should be flat): std={ridge[50:-50, 0].std():.2f}")
