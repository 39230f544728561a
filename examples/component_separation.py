"""Component separation with the synchrosqueezed CWT.

Two summed chirps are separated by inverting ssq_cwt over curve bands
around each component's ridge (the reference's component-inversion
workflow: old/tests/reconstruction_test.py:126-157 with
toolkit.lin_band). Run: python examples/component_separation.py
"""
import sys

sys.path.insert(0, ".")

import numpy as np

from ssqueeze_rs_tpu import ssq_cwt, issq_cwt, extract_ridges, mad_rms
from ssqueeze_rs_tpu.signals import TestSignals


def main():
    N = 2048
    ts = TestSignals(N)
    x1, t = ts.sine(N, f=64)
    x2, _ = ts.lchirp(N, fmin=128, fmax=400)
    x = x1 + x2

    wav = ("gmw", {"beta": 6.0})   # moderate-Q wavelet separates cleanly
    Tx, Wx, ssq_freqs, scales = ssq_cwt(x, wav, dtype="float64")
    Tx = np.asarray(Tx)

    # ridges of the two components on the synchrosqueezed plane: (N, 2)
    cc = np.asarray(extract_ridges(Tx, np.asarray(ssq_freqs),
                                   penalty=2.0, n_ridges=2,
                                   bw=25)).astype(np.int32)

    # invert each component over a band around its ridge
    bw = 20
    cw = np.full_like(cc, bw)
    xrec = np.asarray(issq_cwt(Tx, wav, cc, cw))

    # match recovered rows to sources by correlation
    comps = {}
    for src_name, src in [("sine 64 Hz", x1), ("lchirp 128-400 Hz", x2)]:
        errs = [mad_rms(src, xrec[k]) for k in range(2)]
        k = int(np.argmin(errs))
        comps[src_name] = errs[k]
        print(f"{src_name}: component {k}, mad_rms={errs[k]:.3f}")
    resid = mad_rms(x, xrec.sum(axis=0))
    print(f"sum-of-components vs input: mad_rms={resid:.3f}")

    assert all(e < 0.5 for e in comps.values()), comps
    return comps


if __name__ == "__main__":
    main()
