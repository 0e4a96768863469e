"""Greedy + beam search invariants (reference has only greedy; beam is new —
model2.py:113-114 is an empty stub)."""

import jax
import jax.numpy as jnp
import numpy as np

from show_and_tell_tpu.config import Config
from show_and_tell_tpu.decode import beam_search, greedy_decode
from show_and_tell_tpu.models.registry import build_model
from show_and_tell_tpu.utils.vocab import END_ID, PAD_ID, START_ID

V = 17


def _markov_step_fn(key, V, B):
    """Deterministic step: logits depend only on the previous token (a fixed
    transition matrix) — lets tests recompute any sequence's score exactly."""
    logits_table = jax.random.normal(key, (V, V)) * 2.0

    def step_fn(carry, token_ids):
        return carry, logits_table[token_ids]

    return step_fn, logits_table


def test_greedy_shapes_and_determinism():
    step_fn, _ = _markov_step_fn(jax.random.PRNGKey(0), V, 4)
    ids1 = greedy_decode(step_fn, {}, batch=4, max_len=6)
    ids2 = greedy_decode(step_fn, {}, batch=4, max_len=6)
    assert ids1.shape == (4, 6)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))


def test_beam1_equals_greedy():
    step_fn, _ = _markov_step_fn(jax.random.PRNGKey(1), V, 3)
    g = greedy_decode(step_fn, {}, batch=3, max_len=5)
    b, _ = beam_search(step_fn, {}, batch=3, beam_size=1, max_len=5)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(b))


def test_beam_score_is_sequence_logprob():
    step_fn, table = _markov_step_fn(jax.random.PRNGKey(2), V, 2)
    ids, scores = beam_search(step_fn, {}, batch=2, beam_size=4, max_len=5)
    logp = np.asarray(jax.nn.log_softmax(table, axis=-1))
    for b in range(2):
        seq = [int(t) for t in np.asarray(ids[b])]
        prev = START_ID
        total = 0.0
        for t in seq:
            if t == PAD_ID:
                break
            total += logp[prev, t]
            prev = t
            if t == END_ID:
                break
        np.testing.assert_allclose(total, float(scores[b]), atol=1e-4)


def test_beam_beats_or_matches_greedy_score():
    step_fn, table = _markov_step_fn(jax.random.PRNGKey(3), V, 2)
    logp = np.asarray(jax.nn.log_softmax(table, axis=-1))

    def score(seq):
        prev, tot = START_ID, 0.0
        for t in seq:
            if t == PAD_ID:
                break
            tot += logp[prev, t]
            prev = t
            if t == END_ID:
                break
        return tot

    g = np.asarray(greedy_decode(step_fn, {}, batch=2, max_len=5))
    ids, _ = beam_search(step_fn, {}, batch=2, beam_size=8, max_len=5)
    for b in range(2):
        assert score(list(np.asarray(ids[b]))) >= score(list(g[b])) - 1e-5


def test_beam_end_freezing():
    """Once a beam emits <end> it only appends <pad> and its score is frozen."""
    # Transition matrix that makes <end> overwhelmingly likely from token 5.
    table = np.full((V, V), -10.0, np.float32)
    table[START_ID, 5] = 10.0
    table[5, END_ID] = 10.0
    table[END_ID] = -10.0  # anything after <end> would tank the score

    def step_fn(carry, token_ids):
        return carry, jnp.asarray(table)[token_ids]

    ids, scores = beam_search(step_fn, {}, batch=1, beam_size=3, max_len=6)
    seq = list(np.asarray(ids[0]))
    assert seq[0] == 5 and seq[1] == END_ID
    assert all(t == PAD_ID for t in seq[2:])


def test_beam_with_model_step():
    """Beam search through the real Show-Attend-Tell step function."""
    cfg = Config(embed_size=16, hidden_size=24, num_layers=1, crop_size=32)
    m = build_model(cfg.replace(model="show_attend_tell"), V)
    trainable, _ = m.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 512))
    step_fn_b, carry_b, first = m.make_decode_state(trainable, feats, beam_size=3)
    assert first is None
    ids, scores = jax.jit(
        lambda c: beam_search(step_fn_b, c, batch=2, beam_size=3, max_len=7, tile=False)
    )(carry_b)
    assert ids.shape == (2, 7)
    assert scores.shape == (2,)
    step_fn, carry, _ = m.make_decode_state(trainable, feats)
    g = greedy_decode(step_fn, carry, batch=2, max_len=7)
    assert g.shape == (2, 7)
    # beam-1 through the pre-tiled path must equal greedy
    step_fn1, carry1, _ = m.make_decode_state(trainable, feats, beam_size=1)
    b1, _ = beam_search(step_fn1, carry1, batch=2, beam_size=1, max_len=7, tile=False)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(b1))


def test_show_tell_first_logits_path():
    cfg = Config(
        embed_size=16, hidden_size=24, num_layers=2, crop_size=32, model="show_tell"
    )
    m = build_model(cfg, V)
    trainable, _ = m.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (3, m.feature_dim))
    step_fn, carry, first = m.make_decode_state(trainable, m.init_batch_stats(), feats)
    assert first.shape == (3, V)
    g = greedy_decode(step_fn, carry, batch=3, max_len=5, first_logits=first)
    assert g.shape == (3, 5)
    # token 0 must be argmax of the image-feature step (models.py:58-62)
    np.testing.assert_array_equal(
        np.asarray(g[:, 0]), np.asarray(jnp.argmax(first, axis=-1))
    )
    ids, _ = beam_search(
        step_fn, carry, batch=3, beam_size=3, max_len=5, first_logits=first
    )
    assert ids.shape == (3, 5)


def test_beam_return_all_nbest():
    step_fn, table = _markov_step_fn(jax.random.PRNGKey(5), V, 2)
    ids, scores = beam_search(step_fn, {}, batch=2, beam_size=4, max_len=5, return_all=True)
    assert ids.shape == (2, 4, 5)
    assert scores.shape == (2, 4)
    # sorted best-first
    s = np.asarray(scores)
    assert (s[:, :-1] >= s[:, 1:] - 1e-6).all()
    # best-of-all equals the single-best API
    b1, s1 = beam_search(step_fn, {}, batch=2, beam_size=4, max_len=5)
    np.testing.assert_array_equal(np.asarray(ids[:, 0]), np.asarray(b1))


def test_sample_decode():
    from show_and_tell_tpu.decode import sample_decode

    step_fn, table = _markov_step_fn(jax.random.PRNGKey(6), V, 3)
    ids1 = sample_decode(step_fn, {}, batch=3, rng=jax.random.PRNGKey(0), max_len=6)
    ids2 = sample_decode(step_fn, {}, batch=3, rng=jax.random.PRNGKey(0), max_len=6)
    ids3 = sample_decode(step_fn, {}, batch=3, rng=jax.random.PRNGKey(1), max_len=6)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))  # same key
    assert not np.array_equal(np.asarray(ids1), np.asarray(ids3))  # new key
    # temperature -> 0 approaches greedy
    g = greedy_decode(step_fn, {}, batch=3, max_len=6)
    t0 = sample_decode(
        step_fn, {}, batch=3, rng=jax.random.PRNGKey(2), max_len=6, temperature=1e-4
    )
    np.testing.assert_array_equal(np.asarray(g), np.asarray(t0))
    # top-k=1 is exactly greedy regardless of rng
    k1 = sample_decode(
        step_fn, {}, batch=3, rng=jax.random.PRNGKey(3), max_len=6, top_k=1
    )
    np.testing.assert_array_equal(np.asarray(g), np.asarray(k1))


def test_sample_decode_top_p():
    from show_and_tell_tpu.decode import sample_decode
    from show_and_tell_tpu.decode.sample import _sample_from_logits

    # key 6's table emits no <end> within 6 steps (pinned by the greedy-
    # equivalence asserts in test_sample_decode — greedy pads after <end>,
    # sampling does not, so the equivalence needs an <end>-free horizon)
    step_fn, table = _markov_step_fn(jax.random.PRNGKey(6), V, 3)
    g = greedy_decode(step_fn, {}, batch=3, max_len=6)
    # tiny top_p keeps only the argmax -> exactly greedy, any rng
    p0 = sample_decode(
        step_fn, {}, batch=3, rng=jax.random.PRNGKey(4), max_len=6, top_p=1e-6
    )
    np.testing.assert_array_equal(np.asarray(g), np.asarray(p0))
    # top_p=1.0 is a no-op: identical draws to unfiltered sampling
    ids_full = sample_decode(
        step_fn, {}, batch=3, rng=jax.random.PRNGKey(5), max_len=6
    )
    ids_p1 = sample_decode(
        step_fn, {}, batch=3, rng=jax.random.PRNGKey(5), max_len=6, top_p=1.0
    )
    np.testing.assert_array_equal(np.asarray(ids_full), np.asarray(ids_p1))
    # nucleus support is exactly the minimal prefix reaching the mass:
    # probs [.5,.3,.15,.05] with top_p=.6 keeps {0,1}; many draws must
    # never leave the nucleus but must hit both members
    logits = jnp.log(jnp.array([[0.5, 0.3, 0.15, 0.05]], jnp.float32))
    draws = np.asarray(
        jax.vmap(
            lambda r: _sample_from_logits(r, logits, 1.0, 0, 0.6)[0]
        )(jax.random.split(jax.random.PRNGKey(6), 200))
    )
    assert set(draws.tolist()) == {0, 1}
    # top_p composes after top_k: k=3 then p=.95 still excludes id 3
    draws_k = np.asarray(
        jax.vmap(
            lambda r: _sample_from_logits(r, logits, 1.0, 3, 0.95)[0]
        )(jax.random.split(jax.random.PRNGKey(7), 200))
    )
    assert set(draws_k.tolist()) == {0, 1, 2}


def test_early_stop_matches_scan_after_truncation():
    """Early-exit while_loop and fixed scan produce identical captions after
    <end> truncation; with forced <end> early-stop pads the tail exactly."""
    table = np.full((V, V), -10.0, np.float32)
    table[START_ID, 5] = 10.0
    table[5, 6] = 10.0
    table[6, END_ID] = 10.0
    table[END_ID, 7] = 10.0  # scan mode would emit 7s after <end>

    def step_fn(carry, token_ids):
        return carry, jnp.asarray(table)[token_ids]

    es = np.asarray(greedy_decode(step_fn, {}, batch=2, max_len=8, early_stop=True))
    sc = np.asarray(greedy_decode(step_fn, {}, batch=2, max_len=8, early_stop=False))
    assert es[0].tolist() == [5, 6, END_ID, PAD_ID, PAD_ID, PAD_ID, PAD_ID, PAD_ID]
    assert sc[0].tolist()[:3] == [5, 6, END_ID]  # tail is don't-care tokens
    b_es, s_es = beam_search(step_fn, {}, batch=2, beam_size=3, max_len=8, early_stop=True)
    b_sc, s_sc = beam_search(step_fn, {}, batch=2, beam_size=3, max_len=8, early_stop=False)
    np.testing.assert_array_equal(np.asarray(b_es), np.asarray(b_sc))
    np.testing.assert_allclose(np.asarray(s_es), np.asarray(s_sc), atol=1e-6)


def test_early_stop_no_end_reaches_budget():
    step_fn, _ = _markov_step_fn(jax.random.PRNGKey(11), V, 3)
    a = greedy_decode(step_fn, {}, batch=3, max_len=6, early_stop=True)
    b = greedy_decode(step_fn, {}, batch=3, max_len=6, early_stop=False)
    # random table: if no <end> sampled, both run the full budget identically
    ea, eb = np.asarray(a), np.asarray(b)
    checked = 0
    for row_a, row_b in zip(ea, eb):
        if END_ID not in list(row_a):
            np.testing.assert_array_equal(row_a, row_b)
            checked += 1
    # guard against silent vacuity: the seed-11 table must keep producing at
    # least one end-free row, or this test asserts nothing
    assert checked > 0


def test_length_penalty_prefers_longer():
    """GNMT length penalty divides by ((5+len)/6)^alpha: for equally scored
    negative-logprob beams it boosts longer sequences."""
    # two paths: short "5 <end>" vs longer "8 9 10 <end>", tuned so raw score
    # favours the short one but normalised score favours the long one.
    table = np.full((V, V), -20.0, np.float32)
    table[START_ID, 5] = 3.0       # short path start
    table[START_ID, 8] = 2.9       # long path start (slightly less likely)
    table[5, END_ID] = 0.0
    table[5, 6] = -1.0
    table[8, 9] = 3.0
    table[9, 10] = 3.0
    table[10, END_ID] = 3.0

    def step_fn(carry, token_ids):
        return carry, jnp.asarray(table)[token_ids]

    ids_raw, _ = beam_search(step_fn, {}, batch=1, beam_size=4, max_len=6,
                             length_penalty=0.0)
    ids_lp, _ = beam_search(step_fn, {}, batch=1, beam_size=4, max_len=6,
                            length_penalty=2.0)
    raw = [t for t in np.asarray(ids_raw[0]) if t != PAD_ID]
    lp = [t for t in np.asarray(ids_lp[0]) if t != PAD_ID]
    assert len(lp) >= len(raw)  # normalisation favours the longer hypothesis


def test_length_penalty_unfinished_beam_semantics_pinned():
    """Documents-by-assertion the alpha>0 normalisation contract
    (decode/beam.py): every beam's returned score is
    raw_logprob / ((5+len)/6)^alpha where len counts NON-PAD tokens —
    including <end> for finished beams, and the FULL max_len budget for
    beams that never emit <end>. The latter deviates from a strict GNMT
    reading (which would normalise a partial hypothesis by its emitted
    prefix length as-of <end>, one less than counting an <end> it never
    produced); the deviation is inert at the default alpha=0 and is
    recorded in docs/PARITY.md. VERDICT r4 item 7."""
    alpha = 1.5
    max_len = 6
    # beam A finishes in 2 tokens; beam B never finishes (no <end> mass)
    table = np.full((V, V), -30.0, np.float32)
    table[START_ID, 5] = 1.0
    table[START_ID, 8] = 0.8
    table[5, END_ID] = 0.0      # A: "5 <end>"           -> len 2
    table[8, 9] = 0.0
    table[9, 8] = 0.0           # B: "8 9 8 9 8 9"      -> len max_len
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(table), axis=-1))

    def step_fn(carry, token_ids):
        return carry, jnp.asarray(table)[token_ids]

    ids, scores = beam_search(
        step_fn, {}, batch=1, beam_size=2, max_len=max_len,
        length_penalty=alpha, return_all=True,
    )
    ids, scores = np.asarray(ids[0]), np.asarray(scores[0])
    for k in range(2):
        seq = [int(t) for t in ids[k] if t != PAD_ID]
        raw, prev = 0.0, START_ID
        for t in seq:
            raw += logp[prev, t]
            prev = t
        # the pinned length: non-pad count — <end> included when emitted,
        # max_len (the whole budget) when not
        pinned_len = len(seq)
        if END_ID not in seq:
            assert pinned_len == max_len
        np.testing.assert_allclose(
            scores[k], raw / ((5.0 + pinned_len) / 6.0) ** alpha, rtol=1e-5
        )
    # both shapes appear in the returned beam set
    lens = sorted(int(np.sum(ids[k] != PAD_ID)) for k in range(2))
    assert lens == [2, max_len], lens
