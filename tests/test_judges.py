"""Quality-judge tests: Frechet vs closed form, CIDEr-D behavior, MAUVE
behavior, random-conv FID tracking, asset gating."""

import numpy as np
import pytest

from unidisc_tpu.eval import judges
from unidisc_tpu.eval.fid import FIDMetric, RunningMoments, frechet_distance


def test_frechet_matches_closed_form():
    """For Gaussians with diagonal covariance the Frechet distance is
    analytic: |m1-m2|^2 + sum(c1 + c2 - 2 sqrt(c1 c2)). The statistics
    pipeline (streaming moments + matrix sqrtm) must converge to it."""
    rng = np.random.RandomState(0)
    d = 8
    m1 = np.linspace(0.0, 1.0, d)
    m2 = m1 + 0.5
    c1 = np.linspace(0.5, 1.5, d)
    c2 = np.linspace(1.0, 2.0, d)
    n = 200_000
    x1 = rng.randn(n, d) * np.sqrt(c1) + m1
    x2 = rng.randn(n, d) * np.sqrt(c2) + m2

    r1, r2 = RunningMoments(d), RunningMoments(d)
    for i in range(0, n, 50_000):  # streaming in chunks
        r1.update(x1[i:i + 50_000])
        r2.update(x2[i:i + 50_000])
    fid = frechet_distance(r1.mean, r1.cov, r2.mean, r2.cov)

    analytic = float(((m1 - m2) ** 2).sum() +
                     (c1 + c2 - 2 * np.sqrt(c1 * c2)).sum())
    assert abs(fid - analytic) / analytic < 0.02, (fid, analytic)


def test_cider_d_exact_match_and_ordering():
    refs = [["a red bird sits on a branch"],
            ["two dogs play in the park"],
            ["a man rides a blue bicycle"]]
    perfect = [r[0] for r in refs]
    partial = ["a red bird on a rock",
               "two dogs sleep in the house",
               "a man rides a red car"]
    unrelated = ["quantum flux capacitors everywhere",
                 "stochastic gradient descent converges",
                 "seven eight nine ten eleven"]
    s_perfect = judges.cider_d(perfect, refs)
    s_partial = judges.cider_d(partial, refs)
    s_bad = judges.cider_d(unrelated, refs)
    assert s_perfect > s_partial > s_bad
    assert s_bad < 0.5
    assert s_perfect > 5.0  # exact matches score ~10


def test_cider_d_length_penalty():
    # refs must differ across images, else every n-gram has df == N and
    # idf == 0 (a property of the real metric, not a bug)
    refs = [["the cat sat on the mat"],
            ["a dog runs through tall grass"]]
    short = ["the cat sat on the mat",
             "a dog runs through tall grass"]
    padded = ["the cat sat on the mat " + "filler " * 20,
              "a dog runs through tall grass " + "filler " * 20]
    assert judges.cider_d(short, refs) > judges.cider_d(padded, refs)


def test_mauve_same_vs_disjoint():
    rng = np.random.RandomState(3)
    vocab_a = [f"tok{i}" for i in range(50)]
    vocab_b = [f"other{i}" for i in range(50)]

    def sample_texts(vocab, n):
        return [" ".join(rng.choice(vocab, size=12)) for _ in range(n)]

    p = sample_texts(vocab_a, 120)
    q_same = sample_texts(vocab_a, 120)
    q_disjoint = sample_texts(vocab_b, 120)
    q_mixed = sample_texts(vocab_a + vocab_b, 120)

    s_same = judges.mauve_score(p, q_same, seed=1)["mauve"]
    s_mixed = judges.mauve_score(p, q_mixed, seed=1)["mauve"]
    s_disj = judges.mauve_score(p, q_disjoint, seed=1)["mauve"]
    assert s_same > 0.8, s_same
    assert s_disj < 0.1, s_disj
    assert s_same > s_mixed > s_disj


def test_random_conv_fid_tracks_distribution_shift():
    rng = np.random.RandomState(5)

    def blobs(n, offset=0.0):
        """Images with a bright blob; `offset` shifts the distribution."""
        imgs = np.zeros((n, 32, 32, 3), np.float32)
        for i in range(n):
            cx, cy = rng.randint(8, 24, 2)
            imgs[i, cx - 4:cx + 4, cy - 4:cy + 4] = \
                rng.rand(3) * (1 - offset) + offset
        return imgs

    feat = judges.random_conv_features(dim=64, image_size=32)
    # determinism
    x = blobs(4)
    np.testing.assert_array_equal(feat(x), feat(x))

    real, similar, noise = blobs(64), blobs(64), rng.rand(64, 32, 32, 3)
    f_sim = FIDMetric(feat, 64)
    f_sim.update_real(real)
    f_sim.update_fake(similar)
    f_noise = FIDMetric(feat, 64)
    f_noise.update_real(real)
    f_noise.update_fake(noise)
    assert f_sim.compute() < f_noise.compute()


def test_asset_gated_judges_raise_without_assets(monkeypatch, tmp_path):
    monkeypatch.delenv("UNIDISC_ASSETS", raising=False)
    with pytest.raises(FileNotFoundError):
        judges.inception_features()
    with pytest.raises(FileNotFoundError):
        judges.clip_score_fn()
    with pytest.raises(FileNotFoundError):
        judges.judge_lm()
    # empty assets dir: still missing the specific files
    monkeypatch.setenv("UNIDISC_ASSETS", str(tmp_path))
    with pytest.raises(FileNotFoundError):
        judges.inception_features()


def test_bag_of_ngrams_features_deterministic():
    t = ["hello world foo", "bar baz qux"]
    np.testing.assert_array_equal(judges.bag_of_ngrams_features(t),
                                  judges.bag_of_ngrams_features(t))


# ---------------------------------------------------------------------------
# Asset drop round-trip (round-3 VERDICT #4): randomly-initialized weights
# saved in the DOCUMENTED layout must load and score through each judge —
# proving a real asset drop would work first try (the published files are
# state_dicts; eval/judge_nets.py holds the architecture ports).
# ---------------------------------------------------------------------------

def _fake_clip_dir(path, projection_dim=64):
    """Write a tiny random HF CLIP dir (model + processor + BPE
    tokenizer whose EOT is the highest id, as in the real CLIP vocab)."""
    import json as _json

    from transformers import (CLIPConfig, CLIPImageProcessor, CLIPModel,
                              CLIPTokenizer)
    cfg = CLIPConfig(
        projection_dim=projection_dim,
        text_config={"hidden_size": 32, "intermediate_size": 64,
                     "num_hidden_layers": 2, "num_attention_heads": 2,
                     "max_position_embeddings": 77, "vocab_size": 16},
        vision_config={"hidden_size": 32, "intermediate_size": 64,
                       "num_hidden_layers": 2, "num_attention_heads": 2,
                       "image_size": 224, "patch_size": 32})
    CLIPModel(cfg).save_pretrained(path)
    CLIPImageProcessor().save_pretrained(path)
    vocab = {chr(97 + i) + "</w>": i for i in range(10)}
    vocab["<|startoftext|>"] = 14
    vocab["<|endoftext|>"] = 15
    (path / "vocab.json").write_text(_json.dumps(vocab))
    (path / "merges.txt").write_text("#version: 0.2\n")
    tok = CLIPTokenizer(str(path / "vocab.json"),
                        str(path / "merges.txt"))
    tok.save_pretrained(path)


def test_inception_asset_drop_loads_and_scores(monkeypatch, tmp_path):
    """pt_inception-2015-12-05.pt is a STATE_DICT — a random one saved in
    the documented name must load into FIDInceptionV3 and produce 2048-d
    features."""
    import torch

    from unidisc_tpu.eval.judge_nets import FIDInceptionV3

    torch.manual_seed(0)
    net = FIDInceptionV3()
    torch.save(net.state_dict(), tmp_path / "pt_inception-2015-12-05.pt")
    monkeypatch.setenv("UNIDISC_ASSETS", str(tmp_path))

    feats = judges.inception_features()
    imgs = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    out = feats(imgs)
    assert out.shape == (2, 2048)
    assert np.isfinite(out).all()


def test_hpsv2_asset_drop_loads_and_scores(monkeypatch, tmp_path):
    """The HPSv2 file is {'state_dict': open_clip weights} — a small
    random open_clip-layout checkpoint must size/load OpenClipModel and
    score image-prompt pairs."""
    import torch

    from unidisc_tpu.eval.judge_nets import OpenClipModel

    torch.manual_seed(1)
    model = OpenClipModel(image_size=28, patch=14, v_width=160,
                          v_layers=2, v_heads=2, t_width=128, t_layers=2,
                          t_heads=2, vocab=16, ctx=77, embed_dim=64)
    for p in model.parameters():
        p.data.normal_(0, 0.02)
    torch.save({"state_dict": model.state_dict()},
               tmp_path / "HPS_v2_compressed.pt")
    _fake_clip_dir(tmp_path / "clip-vit-large-patch14")
    monkeypatch.setenv("UNIDISC_ASSETS", str(tmp_path))

    score = judges.hpsv2_fn()
    imgs = np.random.RandomState(0).rand(3, 32, 32, 3).astype(np.float32)
    out = score(imgs, ["a cat", "a dog", "a house"])
    assert out.shape == (3,)
    assert np.isfinite(out).all()
    assert (np.abs(out) <= 1.0 + 1e-5).all()  # cosine of unit vectors


def test_laion_aesthetic_asset_drop_loads_and_scores(monkeypatch,
                                                     tmp_path):
    """ava+logos-l14-linearMSE.pth is the MLP head's state_dict — a
    random one + a CLIP dir must produce sigmoid scores in (0, 1)."""
    import torch

    from unidisc_tpu.eval.judge_nets import AestheticPredictor

    torch.manual_seed(2)
    head = AestheticPredictor(64)  # matches the fake CLIP projection_dim
    torch.save(head.state_dict(),
               tmp_path / "ava+logos-l14-linearMSE.pth")
    _fake_clip_dir(tmp_path / "clip-vit-large-patch14")
    monkeypatch.setenv("UNIDISC_ASSETS", str(tmp_path))

    score = judges.laion_aesthetic_fn()
    imgs = (np.random.RandomState(0).rand(2, 48, 48, 3) * 255)
    out = score(imgs.astype(np.float32))
    assert out.shape == (2,)
    assert ((out > 0) & (out < 1)).all()


def test_hpsv2_and_laion_rewards_route_through_registry(monkeypatch,
                                                        tmp_path):
    """The reward registry entries must reach the real judges (not the
    former raise-stubs) once assets exist."""
    import torch

    from unidisc_tpu.eval.judge_nets import (AestheticPredictor,
                                             OpenClipModel)
    from unidisc_tpu.eval.rewards import get_scorer

    torch.manual_seed(3)
    model = OpenClipModel(image_size=28, patch=14, v_width=160,
                          v_layers=2, v_heads=2, t_width=128, t_layers=2,
                          t_heads=2, vocab=16, ctx=77, embed_dim=64)
    torch.save({"state_dict": model.state_dict()},
               tmp_path / "HPS_v2_compressed.pt")
    torch.save(AestheticPredictor(64).state_dict(),
               tmp_path / "ava+logos-l14-linearMSE.pth")
    _fake_clip_dir(tmp_path / "clip-vit-large-patch14")
    monkeypatch.setenv("UNIDISC_ASSETS", str(tmp_path))

    batch = {"images": np.random.RandomState(1).rand(
        2, 32, 32, 3).astype(np.float32),
        "texts": ["abc", "bcd"]}
    hps = get_scorer("hpsv2")(batch)
    aes = get_scorer("laion_aesthetic")(batch)
    assert hps.shape == (2,) and np.isfinite(hps).all()
    assert aes.shape == (2,) and np.isfinite(aes).all()
