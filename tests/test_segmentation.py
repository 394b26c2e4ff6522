import numpy as np

from cbfssm_tpu.models import segmentation


def literal_reference_conditions(t, recog_len, run):
    """Direct transcription of the reference's per-step conditions
    (cbfssm.py:122-128) for property-testing the vectorized masks."""
    if run == 0:
        resample = (t + 1) % (2 * recog_len) == 0
        write = t % (2 * recog_len) < recog_len
    else:
        resample = (t + recog_len + 1) % (2 * recog_len) == 0
        write = t % (2 * recog_len) >= recog_len
    return resample, write


def test_masks_match_literal_rederivation():
    for seq_len in [7, 16, 32, 50, 100]:
        for recog_len in [2, 4, 8, 16, 50]:
            resample, write0 = segmentation.backward_masks(seq_len, recog_len)
            for t in range(seq_len):
                r0, w0 = literal_reference_conditions(t, recog_len, 0)
                r1, w1 = literal_reference_conditions(t, recog_len, 1)
                assert resample[t, 0] == r0, (seq_len, recog_len, t)
                assert resample[t, 1] == r1, (seq_len, recog_len, t)
                assert write0[t] == w0, (seq_len, recog_len, t)
                # the two runs' write masks are exact complements
                assert w1 == (not w0)


def test_every_step_written_by_exactly_one_run():
    """The reference's two per-run write conditions (transcribed
    independently above) cover every timestep EXACTLY once — the
    property the library encodes structurally as write_run1 = ~write_run0.
    Checked from the literal transcription, not the library masks (the
    library-side identity would be a tautology)."""
    for recog_len in (2, 4, 8, 16):
        for t in range(6 * recog_len + 3):
            _, w0 = literal_reference_conditions(t, recog_len, 0)
            _, w1 = literal_reference_conditions(t, recog_len, 1)
            assert w0 != w1, (recog_len, t)


def test_each_run_burns_in_before_writing():
    """Walking backward in time, each run resamples at its segment
    boundary and then has recog_len burn-in steps before its write
    segment begins."""
    seq_len, recog_len = 64, 8
    resample, write0 = segmentation.backward_masks(seq_len, recog_len)
    # Run 0 resamples entering t = 2L-1, 4L-1, ... (counting down).
    expected_r0 = {2 * recog_len * k - 1 for k in range(1, seq_len)}
    got_r0 = {t for t in range(seq_len) if resample[t, 0]}
    assert got_r0 == {t for t in expected_r0 if 0 <= t < seq_len}
    # After resampling at t = 2L-1 the run walks down through the
    # non-written segment [L, 2L-1] and writes [0, L-1].
    for t in range(recog_len, 2 * recog_len):
        assert not write0[t]
    for t in range(recog_len):
        assert write0[t]


def test_forward_condition_mask():
    m = segmentation.forward_condition_mask(10, 4)
    np.testing.assert_array_equal(m, [True, True, True, False, False, False, False, False, False])
