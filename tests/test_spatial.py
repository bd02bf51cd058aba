"""Far-field 7ch spatialization: geometry consistency with the DOA
steering table, and MVDR beamforming quality on spatialized material."""

import numpy as np

import jax.numpy as jnp

from css_tpu.data import SyntheticCorpus
from css_tpu.data.spatial import mic_delays, spatial_session, spatialize_7ch
from css_tpu.executor.doa import SteeringVectors
from css_tpu.ops.stft import stft


def test_center_mic_is_dry_source():
    s = SyntheticCorpus(num_speakers=1, utts_per_speaker=1,
                        seed=4).utterances[0].load()[: 16000]
    chans = spatialize_7ch(s, azimuth_deg=72.0)
    assert chans.shape == (7, len(s))
    assert np.allclose(chans[0], s, atol=1e-4)  # mic 0 delay is exactly 0
    assert mic_delays(72.0)[0] == 0.0


def test_doa_recovers_synthesis_azimuth():
    """The spatializer and the steering table share one geometry: the
    masked DOA likelihood must peak at the synthesis azimuth exactly
    (12 deg grid)."""
    s = SyntheticCorpus(num_speakers=1, utts_per_speaker=1,
                        seed=4).utterances[0].load()[: 16000 * 2]
    sv = SteeringVectors()
    for az in (0.0, 48.0, 264.0):
        chans = spatialize_7ch(s, az)
        spec = stft(jnp.asarray(chans), 512, 256)  # (7, T, F)
        mask = jnp.ones(spec.shape[1:] + (1,))
        lik = np.asarray(sv.doa_likelihood(spec[None], mask[None]))
        assert sv.angles[lik[0, 0].argmax()] == az


def test_oracle_mvdr_separates_spatial_mixture():
    """Full windowed Souden-MVDR chain on a spatialized 2-speaker mixture
    with oracle masks: strongly positive SI-SNRi on both streams."""
    from css_tpu.executor.beamformer import Beamformer
    from css_tpu.executor.stitcher import Stitcher
    from css_tpu.utils.metrics import si_snr_improvement_db
    from scripts.spatial_quality_eval import oracle_window_masks

    corpus = SyntheticCorpus(num_speakers=2, utts_per_speaker=1, seed=9,
                             min_dur=6.0, max_dur=7.0)
    n = 16000 * 5
    srcs = np.stack([corpus.by_speaker["spk0"][0].load()[:n],
                     corpus.by_speaker["spk1"][0].load()[:n]])
    wav7 = spatial_session(srcs, [36.0, 228.0], noise_level=0.003, seed=1)
    win, hop = int(2.4 * 16000) + 256, int(0.8 * 16000)
    total = wav7.shape[-1]
    n_win = max(1, -(-(total - win) // hop) + 1)
    needed = (n_win - 1) * hop + win
    wav7_p = np.pad(wav7, [(0, 0), (0, needed - total)])
    srcs_p = np.pad(srcs, [(0, 0), (0, needed - total)])

    masks, _ = oracle_window_masks(srcs_p, wav7_p[0], win, hop)
    ident = np.tile(np.arange(2, dtype=np.int32), (masks.shape[0] - 1, 1))
    stitcher = Stitcher(eval_win=2.4, eval_hop=0.8, fft_hop=256)
    stitched = [np.asarray(m) for m in stitcher.get_connect(
        jnp.asarray(ident), jnp.asarray(masks))]
    bf = Beamformer(bf_type="SoudenMVDRBeamformer", eval_win=2.4,
                    eval_hop=0.8, n_fft=512, hop_length=256,
                    proceed_margin=2.0)
    outs = [o[:total] for o in bf.continuous_process(wav7_p, stitched)]
    imp = si_snr_improvement_db(outs, list(srcs), wav7[0])
    assert np.isfinite(imp)
    assert imp > 6.0, imp
