"""Dedup / similarity / text-analysis / multimodal plumbing tests."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from auto_featurs_ray.datapipe.dedup import (
    embedding_duplicates,
    exact_dedup,
    minhash_dedup,
    minhash_lsh_duplicates,
    ngram_jaccard_duplicates,
    simhash_duplicates,
)
from auto_featurs_ray.datapipe.multimodal import ImageDecode, decode_pipeline
from auto_featurs_ray.datapipe.similarity import knn_brute_force, knn_ivf
from auto_featurs_ray.datapipe.textstats import (
    Fingerprinter,
    LanguageId,
    TextStats,
    bpe_token_count,
    whitespace_token_count,
    winnowing_fingerprints,
)

BASE = ('the quick brown fox jumps over the lazy dog and then runs far away into the deep '
        'green forest where tall trees grow and small rivers flow gently under the bright sun')


def doc_table():
    texts = [
        BASE,
        BASE,  # exact duplicate of 0
        BASE + ' with one tiny extra suffix here',  # near-dup of 0
        'completely different content about machine learning and ray data pipelines for features',
        'der schnelle braune fuchs springt über den faulen hund und läuft in den wald',
        'le renard brun rapide saute par dessus le chien paresseux et court dans la forêt',
        '',
    ]
    return pa.table({'doc_id': pa.array(range(len(texts)), pa.int64()),
                     'text': pa.array(texts, pa.string())})


class TestExactDedup:
    def test_keeps_min_id(self):
        out = exact_dedup(rd.from_arrow(doc_table()), text_column='text', id_column='doc_id').to_pandas()
        ids = sorted(out['doc_id'])
        assert 0 in ids and 1 not in ids  # doc 1 is the exact dup of doc 0
        assert {2, 3, 4, 5, 6} <= set(ids)


class TestMinHash:
    def test_near_dup_cluster(self):
        clusters = minhash_lsh_duplicates(rd.from_arrow(doc_table()), text_column='text',
                                          id_column='doc_id', jaccard_threshold=0.7)
        got = dict(zip(clusters['id'], clusters['cluster_id']))
        assert got.get(1) == 0  # exact dup
        assert got.get(2) == 0  # near dup
        assert 3 not in got

    def test_dedup_filters_members(self):
        out = minhash_dedup(rd.from_arrow(doc_table()), text_column='text', id_column='doc_id',
                            jaccard_threshold=0.7).to_pandas()
        assert 0 in set(out['doc_id'])
        assert 1 not in set(out['doc_id'])

    def test_deterministic_across_runs(self):
        a = minhash_lsh_duplicates(rd.from_arrow(doc_table()), text_column='text', id_column='doc_id')
        b = minhash_lsh_duplicates(rd.from_arrow(doc_table()), text_column='text', id_column='doc_id')
        assert a.equals(b)


class TestScalePaths:
    def test_anti_join_ids_both_paths_agree(self):
        from auto_featurs_ray.datapipe.dedup import anti_join_ids
        table = pa.table({'doc_id': pa.array(range(100), pa.int64()),
                          'payload': pa.array([f'p{i}' for i in range(100)])})
        drop = np.arange(0, 100, 3)
        small = anti_join_ids(rd.from_arrow(table), drop, id_column='doc_id').to_pandas()
        large = anti_join_ids(rd.from_arrow(table), drop, id_column='doc_id',
                              broadcast_threshold=0, num_partitions=4).to_pandas()
        assert sorted(small['doc_id']) == sorted(large['doc_id'])
        assert set(small['doc_id']) == set(range(100)) - set(drop.tolist())

    def test_distributed_cc_matches_union_find(self):
        import pandas as pd

        from auto_featurs_ray.datapipe.dedup import (_connected_components,
                                                     connected_components_distributed)
        rng = np.random.default_rng(3)
        pairs = pd.DataFrame({'left': rng.integers(0, 300, 400),
                              'right': rng.integers(0, 300, 400)})
        pairs = pairs[pairs.left != pairs.right]
        pairs[['left', 'right']] = np.sort(pairs[['left', 'right']].to_numpy(), axis=1)
        pairs = pairs.drop_duplicates()
        uf = _connected_components(pairs).sort_values('id').reset_index(drop=True)
        dist = connected_components_distributed(pairs, num_partitions=4)
        merged = uf.merge(dist, on='id', suffixes=('_uf', '_d'))
        assert len(merged) == len(uf) == len(dist)
        assert (merged['cluster_id_uf'] == merged['cluster_id_d']).all()


class TestSimHash:
    def test_exact_dup_found(self):
        clusters = simhash_duplicates(rd.from_arrow(doc_table()), text_column='text', id_column='doc_id')
        got = dict(zip(clusters['id'], clusters['cluster_id']))
        assert got.get(1) == 0


class TestNgramJaccard:
    def test_verified_pairs(self):
        pairs = ngram_jaccard_duplicates(rd.from_arrow(doc_table()), text_column='text',
                                         id_column='doc_id', threshold=0.7)
        keys = set(zip(pairs['left'], pairs['right']))
        assert (0, 1) in keys
        assert all(j >= 0.7 for j in pairs['jaccard'])


def embedding_table(n=200, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    emb = rng.standard_normal((n, dim))
    emb[1] = emb[0] + rng.standard_normal(dim) * 0.01  # near-dup pair
    return pa.table({'vec_id': pa.array(range(n), pa.int64()),
                     'embedding': pa.array(list(emb), pa.list_(pa.float64()))})


class TestEmbedding:
    def test_embedding_duplicates(self):
        clusters = embedding_duplicates(rd.from_arrow(embedding_table()), embedding_column='embedding',
                                        id_column='vec_id', threshold=0.99)
        got = dict(zip(clusters['id'], clusters['cluster_id']))
        assert got.get(1) == 0

    def test_knn_brute_force_exact(self):
        table = embedding_table()
        emb = np.stack(table.column('embedding').to_pylist())
        query = emb[0]
        top = knn_brute_force(rd.from_arrow(table), embedding_column='embedding', id_column='vec_id',
                              queries=query[None, :], k=5)
        assert top['id'].tolist()[0] == 0  # itself
        assert top['id'].tolist()[1] == 1  # the planted near-dup
        # matches the full numpy computation
        unit = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        sims = unit @ (query / np.linalg.norm(query))
        expected = np.argsort(-sims)[:5].tolist()
        assert top['id'].tolist() == expected

    def test_persisted_ivf_index_roundtrip(self, tmp_path):
        from auto_featurs_ray.datapipe.similarity import build_ivf_index, knn_ivf_from_index
        table = embedding_table()
        emb = np.stack(table.column('embedding').to_pylist())
        index_dir = str(tmp_path / 'ivf')
        build_ivf_index(rd.from_arrow(table), embedding_column='embedding', id_column='vec_id',
                        index_dir=index_dir, num_centroids=8)
        # index persisted: centroid-partitioned buckets + centroids.npy
        import glob
        import os
        assert os.path.exists(os.path.join(index_dir, 'centroids.npy'))
        assert glob.glob(os.path.join(index_dir, 'buckets', 'centroid=*'))
        # query WITHOUT re-clustering (no dataset needed)
        top = knn_ivf_from_index(index_dir, embedding_column='embedding', id_column='vec_id',
                                 queries=emb[0][None, :], k=5, nprobe=4)
        assert top['id'].tolist()[0] == 0
        assert 1 in top['id'].tolist()  # the planted near-dup

    def test_knn_ivf_finds_neighbor(self):
        table = embedding_table()
        emb = np.stack(table.column('embedding').to_pylist())
        top = knn_ivf(rd.from_arrow(table), embedding_column='embedding', id_column='vec_id',
                      queries=emb[0][None, :], k=5, num_centroids=8, nprobe=3)
        assert 0 in top['id'].tolist()[:2]
        assert 1 in top['id'].tolist()[:3]


class TestTextStats:
    def test_token_counts(self):
        assert whitespace_token_count('foo bar  baz') == 3
        assert bpe_token_count('Hello, world!') >= 4

    def test_stats_stage(self):
        out = rd.from_arrow(doc_table()).map_batches(TextStats, batch_format='pyarrow',
                                                     concurrency=2).to_pandas().sort_values('doc_id')
        assert (out['n_chars_computed'] == out['text'].str.len()).all()
        assert out.loc[out['doc_id'] == 0, 'quality_score'].iloc[0] > out.loc[out['doc_id'] == 6, 'quality_score'].iloc[0]

    def test_language_id(self):
        out = rd.from_arrow(doc_table()).map_batches(LanguageId, batch_format="pyarrow", concurrency=2).to_pandas()
        by_id = dict(zip(out['doc_id'], out['lang_pred']))
        assert by_id[0] == 'en'
        assert by_id[4] == 'de'
        assert by_id[5] == 'fr'
        assert by_id[6] == 'und'

    def test_fingerprints_deterministic(self):
        out1 = rd.from_arrow(doc_table()).map_batches(Fingerprinter, batch_format="pyarrow", concurrency=2).to_pandas()
        out2 = rd.from_arrow(doc_table()).map_batches(Fingerprinter, batch_format="pyarrow", concurrency=2).to_pandas()
        assert out1['fingerprint'].tolist() == out2['fingerprint'].tolist()
        by_id = dict(zip(out1['doc_id'], out1['fingerprint']))
        assert by_id[0] == by_id[1]  # exact dups share the fingerprint
        assert by_id[0] != by_id[3]
        sketches = dict(zip(out1['doc_id'], out1['winnow_sketch']))
        overlap = len(set(sketches[0]) & set(sketches[2])) / max(len(set(sketches[0])), 1)
        assert overlap > 0.5  # near-dup shares most winnowing fingerprints


def media_table(n=6):
    rng = np.random.default_rng(2)
    return pa.table({
        'media_id': pa.array([f'm{i}' for i in range(n)], pa.string()),
        'payload': pa.array([rng.bytes(128) for _ in range(n)], pa.binary()),
        'mime_type': pa.array(['image/jpeg'] * n, pa.string()),
    })


class TestMultimodal:
    def test_stub_raises(self):
        with pytest.raises(NotImplementedError):
            ImageDecode(decoder='stub').decode_one(b'abc')

    def test_fake_pipeline_plumbing(self):
        out = decode_pipeline(rd.from_arrow(media_table()), decoder='fake',
                              concurrency=2, batch_size=4).to_pandas()
        assert len(out) == 6
        assert all(len(p) == 32 * 32 * 3 for p in out['pixels'])
        assert all(len(f) == 7 for f in out['image_features'])
        # deterministic across runs
        out2 = decode_pipeline(rd.from_arrow(media_table()), decoder='fake',
                               concurrency=2, batch_size=4).to_pandas()
        a = out.sort_values('media_id')['image_features'].tolist()
        b = out2.sort_values('media_id')['image_features'].tolist()
        assert all(np.allclose(x, y) for x, y in zip(a, b))

    @staticmethod
    def _ppm(pixels: np.ndarray) -> bytes:
        h, w, _ = pixels.shape
        return b'P6\n# comment\n%d %d\n255\n' % (w, h) + pixels.tobytes()

    @staticmethod
    def _bmp(pixels: np.ndarray) -> bytes:
        h, w, _ = pixels.shape
        stride = ((w * 3 + 3) // 4) * 4
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
        data = rows.tobytes()
        header = (b'BM' + (54 + len(data)).to_bytes(4, 'little') + b'\0\0\0\0'
                  + (54).to_bytes(4, 'little') + (40).to_bytes(4, 'little')
                  + w.to_bytes(4, 'little') + h.to_bytes(4, 'little')
                  + (1).to_bytes(2, 'little') + (24).to_bytes(2, 'little')
                  + (0).to_bytes(4, 'little') + len(data).to_bytes(4, 'little')
                  + b'\0' * 16)
        return header + data

    def test_real_image_decode_ppm_and_bmp(self):
        from auto_featurs_ray.datapipe.multimodal import decode_image_bytes
        rng = np.random.default_rng(4)
        pixels = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
        np.testing.assert_array_equal(decode_image_bytes(self._ppm(pixels)), pixels)
        np.testing.assert_array_equal(decode_image_bytes(self._bmp(pixels)), pixels)
        with pytest.raises(NotImplementedError):
            decode_image_bytes(b'\x89PNG\r\n\x1a\n....')

    def test_auto_decode_pipeline_end_to_end(self):
        rng = np.random.default_rng(5)
        imgs = [rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8) for _ in range(4)]
        table = pa.table({
            'media_id': pa.array([f'm{i}' for i in range(4)], pa.string()),
            'payload': pa.array([self._ppm(p) if i % 2 else self._bmp(p)
                                 for i, p in enumerate(imgs)], pa.binary()),
            'mime_type': pa.array(['image/x-portable-pixmap'] * 4, pa.string()),
        })
        out = decode_pipeline(rd.from_arrow(table), decoder='auto',
                              concurrency=2, batch_size=2).to_pandas()
        assert len(out) == 4
        assert all(len(p) == 32 * 32 * 3 for p in out['pixels'])
        # nearest-neighbor resize preserves channel means approximately
        for i, row in out.sort_values('media_id').reset_index(drop=True).iterrows():
            decoded_mean = np.asarray(row['image_features'][:3])
            src_mean = imgs[i].reshape(-1, 3).mean(axis=0)
            assert np.abs(decoded_mean - src_mean).max() < 30

    def test_real_wav_frame_sampling(self):
        import io as _io
        import wave as _wave

        from auto_featurs_ray.datapipe.multimodal import AudioFrameSample
        rate = 8000
        t = np.arange(rate) / rate
        signal = (np.sin(2 * np.pi * 440 * t) * 32000).astype(np.int16)
        buf = _io.BytesIO()
        with _wave.open(buf, 'wb') as wav:
            wav.setnchannels(1)
            wav.setsampwidth(2)
            wav.setframerate(rate)
            wav.writeframes(signal.tobytes())
        table = pa.table({'media_id': pa.array(['a'], pa.string()),
                          'payload': pa.array([buf.getvalue()], pa.binary())})
        out = (rd.from_arrow(table)
               .map_batches(AudioFrameSample, fn_constructor_kwargs={'decoder': 'auto'},
                            batch_format='pyarrow', concurrency=1)
               .to_pandas())
        frames = np.asarray(out['audio_frames'][0])
        assert len(frames) == 8 * 16
        assert np.abs(frames).max() <= 1.0
        assert np.abs(frames).max() > 0.5  # actually decoded the sine, not silence


class TestDistributedDedupPaths:
    """Round-3: the scale paths (distributed CC, exchange-bucketed simhash,
    co-grouped ngram verify) must agree bit-for-bit with the driver paths."""

    def _dup_corpus(self, n=150):
        base = ['the quick brown fox jumps over the lazy dog number %d' % i for i in range(30)]
        texts, ids = [], []
        for i in range(n):
            t = base[i % 30]
            if i >= 30:
                t += ' tail%d' % (i % 5)
            texts.append(t)
            ids.append(i)
        return pa.table({'doc_id': pa.array(ids, pa.int64()), 'text': pa.array(texts)})

    def test_minhash_clusters_driver_vs_distributed(self):
        import pandas as pd
        ds = rd.from_arrow(self._dup_corpus())
        a = minhash_lsh_duplicates(ds, text_column='text', id_column='doc_id', cc='driver')
        b = minhash_lsh_duplicates(ds, text_column='text', id_column='doc_id', cc='distributed')
        pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True),
                                      check_dtype=False)

    def test_minhash_dedup_survivors_byte_identical(self):
        ds = rd.from_arrow(self._dup_corpus())
        a = (minhash_dedup(ds, text_column='text', id_column='doc_id', cc='driver')
             .to_pandas().sort_values('doc_id').reset_index(drop=True))
        b = (minhash_dedup(ds, text_column='text', id_column='doc_id', cc='distributed')
             .to_pandas().sort_values('doc_id').reset_index(drop=True))
        import pandas as pd
        pd.testing.assert_frame_equal(a, b)

    def test_hamming_matrix_matches_python_popcount(self):
        from auto_featurs_ray.datapipe.dedup import _hamming_matrix
        rng = np.random.default_rng(9)
        hs = rng.integers(0, 2**63, size=40, dtype=np.int64).view(np.uint64)
        got = _hamming_matrix(hs)
        want = np.array([[bin(int(a ^ b)).count('1') for b in hs] for a in hs])
        assert (got == want).all()

    def test_ngram_distributed_matches_local_shingles(self):
        from auto_featurs_ray.datapipe.dedup import _shingle_hashes
        table = doc_table()
        pairs = ngram_jaccard_duplicates(rd.from_arrow(table), text_column='text',
                                         id_column='doc_id', threshold=0.7)
        texts = dict(zip(table.column('doc_id').to_pylist(), table.column('text').to_pylist()))
        for left, right, jac in zip(pairs['left'], pairs['right'], pairs['jaccard']):
            a = _shingle_hashes(texts[left], 5)
            b = _shingle_hashes(texts[right], 5)
            inter = len(np.intersect1d(a, b, assume_unique=True))
            want = inter / (len(a) + len(b) - inter)
            assert abs(jac - want) < 1e-12
            assert want >= 0.7

    def test_cc_warns_when_not_converged(self, caplog):
        import logging

        import pandas as pd

        from auto_featurs_ray.datapipe.dedup import connected_components_distributed
        chain = pd.DataFrame({'left': np.arange(0, 40), 'right': np.arange(1, 41)})
        with caplog.at_level(logging.WARNING, logger='auto_featurs_ray.datapipe.dedup'):
            connected_components_distributed(chain, num_partitions=2, max_rounds=3)
        assert any('did not certify convergence' in r.message for r in caplog.records)

    def test_fnv1a_batch_matches_scalar(self):
        from auto_featurs_ray.datapipe.textstats import fingerprint64, fnv1a64_batch
        texts = ['Hello  World', '', None, 'the quick brown fox', 'a' * 300, 'Ünïcødé tæxt']
        got = fnv1a64_batch(texts)
        want = np.array([np.uint64(fingerprint64(t or '')).astype(np.int64) for t in texts])
        assert (got == want).all()

    def test_winnowing_batch_matches_scalar(self):
        from auto_featurs_ray.datapipe.textstats import (winnowing_fingerprints,
                                                         winnowing_fingerprints_batch)
        texts = [BASE, '', None, 'abc', 'abcdefg', 'abcdefgh', 'abcdefghi',
                 'aaaaaaaaaaaaaaa', 'Ünïcødé tæxt høre mæny wörds', '  x  ', 'ab' * 3,
                 BASE * 3, 'short words here', 'the ' * 50]
        batch = winnowing_fingerprints_batch(texts).to_pylist()
        for t, got in zip(texts, batch):
            assert got == winnowing_fingerprints(t or ''), repr(t)[:40]


class TestDecontamination:
    def test_contamination_flags_benchmark_overlap(self):
        from auto_featurs_ray.datapipe.decontam import ngram_contamination
        bench = ['the quick brown fox jumps over the lazy dog']
        texts = ['a document containing the quick brown fox inside it',
                 'totally different content with no overlap at all', '']
        ds = rd.from_arrow(pa.table({'doc_id': pa.array([0, 1, 2], pa.int64()),
                                     'text': pa.array(texts)}))
        out = ngram_contamination(ds, bench, text_column='text', n=8).to_pandas()
        got = dict(zip(out['doc_id'], out['contaminated']))
        assert got[0] and not got[1] and not got[2]

    def test_repetition_stats_brute(self):
        from collections import Counter

        from auto_featurs_ray.datapipe.decontam import RepetitionStats
        texts = ['spam spam spam spam spam', 'all unique words here now', 'ab', '', None,
                 'Ünïcø Ünïcø Ünïcø repeated unicode']
        out = RepetitionStats('text', n=8)(pa.table({'text': pa.array(texts, pa.string())}))
        for i, t in enumerate(texts):
            s = ' '.join((t or '').split()).lower()
            grams = [s[j:j + 8] for j in range(max(len(s) - 7, 0))]
            c = Counter(grams)
            assert out.column('total_ngrams')[i].as_py() == len(grams)
            assert out.column('distinct_ngrams')[i].as_py() == len(c)
            assert out.column('max_ngram_repeat')[i].as_py() == (max(c.values()) if c else 0)

    def test_pii_masker(self):
        from auto_featurs_ray.datapipe.decontam import PIIMasker
        t = pa.table({'text': pa.array(
            ['mail bob@example.com or call +1 (555) 123-4567 from 10.0.0.1', None])})
        out = PIIMasker('text')(t)
        assert out.column('email_count')[0].as_py() == 1
        assert out.column('phone_count')[0].as_py() == 1
        assert out.column('ipv4_count')[0].as_py() == 1
        assert out.column('masked_text')[0].as_py() == 'mail <EMAIL> or call <PHONE> from <IP>'
        assert out.column('masked_text')[1].as_py() == ''


class TestUnigramLogprob:
    def test_broadcast_and_cogroup_paths_agree(self):
        import pandas as pd

        from auto_featurs_ray.datapipe.textstats import corpus_unigram_logprob
        ds = rd.from_arrow(doc_table())
        a = (corpus_unigram_logprob(ds, text_column='text', id_column='doc_id')
             .to_pandas().sort_values('doc_id').reset_index(drop=True))
        b = (corpus_unigram_logprob(ds, text_column='text', id_column='doc_id',
                                    broadcast_threshold=0)
             .to_pandas().sort_values('doc_id').reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b, rtol=1e-12)

    def test_matches_brute_force(self):
        import re
        from collections import Counter

        import pandas as pd

        from auto_featurs_ray.datapipe.textstats import corpus_unigram_logprob
        table = doc_table()
        out = (corpus_unigram_logprob(rd.from_arrow(table), text_column='text',
                                      id_column='doc_id')
               .to_pandas().set_index('doc_id'))
        texts = dict(zip(table.column('doc_id').to_pylist(), table.column('text').to_pylist()))
        allw = Counter()
        docw = {}
        for d, t in texts.items():
            ws = re.findall(r'[a-z0-9]+', (t or '').lower())
            docw[d] = ws
            allw.update(ws)
        total = sum(allw.values())
        for d, ws in docw.items():
            row = out.loc[d]
            assert row['n_words'] == len(ws)
            if not ws:
                assert pd.isna(row['unigram_logprob'])
            else:
                want = np.mean([np.log2(allw[w] / total) for w in ws])
                assert abs(row['unigram_logprob'] - want) < 1e-9


class TestEmptyCorpus:
    """A dataset filtered to zero rows produces Ray's schema-less empty
    bundles; every dedup entry point must complete and return empty."""

    def _empty_ds(self):
        t = doc_table()
        ds = rd.from_arrow(t)
        return ds.map_batches(lambda b: b.filter(pa.array([False] * b.num_rows)),
                              batch_format='pyarrow')

    def test_exact_dedup_empty(self):
        out = exact_dedup(self._empty_ds(), text_column='text', id_column='doc_id')
        assert out.count() == 0

    def test_minhash_paths_empty(self):
        ds = self._empty_ds()
        clusters = minhash_lsh_duplicates(ds, text_column='text', id_column='doc_id')
        assert len(clusters) == 0
        survivors = minhash_dedup(ds, text_column='text', id_column='doc_id')
        assert survivors.count() == 0

    def test_simhash_and_embedding_empty(self):
        assert len(simhash_duplicates(self._empty_ds(), text_column='text',
                                      id_column='doc_id')) == 0
        et = embedding_table(n=10)
        eds = rd.from_arrow(et).map_batches(
            lambda b: b.filter(pa.array([False] * b.num_rows)), batch_format='pyarrow')
        assert len(embedding_duplicates(eds, embedding_column='embedding',
                                        id_column='vec_id')) == 0

    def test_ngram_jaccard_empty(self):
        pairs = ngram_jaccard_duplicates(self._empty_ds(), text_column='text',
                                         id_column='doc_id')
        assert len(pairs) == 0

    def test_cc_invalid_mode_raises(self):
        import pytest as _pytest
        with _pytest.raises(ValueError, match="cc must be"):
            minhash_dedup(rd.from_arrow(doc_table()), text_column='text',
                          id_column='doc_id', cc='Distributed')


class TestTfidfTopTerms:
    def test_broadcast_and_cogroup_paths_agree(self):
        import pandas as pd

        from auto_featurs_ray.datapipe.textstats import tfidf_top_terms
        ds = rd.from_arrow(doc_table())
        a = (tfidf_top_terms(ds, text_column='text', id_column='doc_id', k=3)
             .to_pandas().sort_values('doc_id').reset_index(drop=True))
        b = (tfidf_top_terms(ds, text_column='text', id_column='doc_id', k=3,
                             broadcast_threshold=0)
             .to_pandas().sort_values('doc_id').reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b, rtol=1e-12)

    def test_matches_brute_force(self):
        import math
        import re
        from collections import Counter

        from auto_featurs_ray.datapipe.textstats import tfidf_top_terms
        table = doc_table()
        out = (tfidf_top_terms(rd.from_arrow(table), text_column='text',
                               id_column='doc_id', k=3)
               .to_pandas().set_index('doc_id'))
        texts = dict(zip(table.column('doc_id').to_pylist(), table.column('text').to_pylist()))
        n = len(texts)
        df = Counter()
        tfs = {}
        for d, t in texts.items():
            ws = re.findall(r'[a-z0-9]+', (t or '').lower())
            tfs[d] = Counter(ws)
            df.update(set(ws))
        for d, tf in tfs.items():
            if not tf:
                assert out.loc[d, 'top_terms'] is None or out.loc[d, 'top_terms'] != out.loc[d, 'top_terms']
                continue
            scored = sorted(
                ((round(c * math.log((n + 1.0) / (df[w] + 1.0)) + 1e-9, 6), w) for w, c in tf.items()),
                key=lambda p: (-p[0], p[1]))
            want = ','.join(w for _, w in scored[:3])
            assert out.loc[d, 'top_terms'] == want, (d, out.loc[d, 'top_terms'], want)
            assert abs(out.loc[d, 'top_score'] - scored[0][0]) < 1e-9

    def test_empty_docs_get_null(self):
        from auto_featurs_ray.datapipe.textstats import tfidf_top_terms
        t = pa.table({'doc_id': pa.array([1, 2], pa.int64()),
                      'text': pa.array(['', None], pa.string())})
        out = tfidf_top_terms(rd.from_arrow(t), text_column='text',
                              id_column='doc_id').to_pandas()
        assert len(out) == 2 and out['top_terms'].isna().all()


class TestBm25:
    def test_matches_brute_force(self):
        import math
        import re
        from collections import Counter

        from auto_featurs_ray.datapipe.textstats import bm25_score
        table = doc_table()
        terms = ['fox', 'the', 'ray']
        out = (bm25_score(rd.from_arrow(table), text_column='text', id_column='doc_id',
                          query_terms=terms)
               .to_pandas().set_index('doc_id'))
        texts = dict(zip(table.column('doc_id').to_pylist(), table.column('text').to_pylist()))
        tfs = {d: Counter(re.findall(r'[a-z0-9]+', (t or '').lower())) for d, t in texts.items()}
        n = len(texts)
        lens = {d: sum(tf.values()) for d, tf in tfs.items()}
        avgdl = sum(lens.values()) / n
        for d, tf in tfs.items():
            if not lens[d]:
                assert np.isnan(out.loc[d, 'bm25'])
                continue
            s = 0.0
            for t in terms:
                if tf[t] == 0:
                    continue
                df = sum(1 for other in tfs.values() if other[t] > 0)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf[t] * 2.2 / (tf[t] + 1.2 * (0.25 + 0.75 * lens[d] / avgdl))
            assert abs(out.loc[d, 'bm25'] - round(s + 1e-9, 6)) < 1e-9, d

    def test_empty_query_rejected(self):
        from auto_featurs_ray.datapipe.textstats import bm25_score
        with pytest.raises(ValueError, match='query_terms'):
            bm25_score(rd.from_arrow(doc_table()), text_column='text',
                       id_column='doc_id', query_terms=[])


class TestOneHotEncode:
    def test_top_k_with_tie_break_and_other(self):
        import pandas as pd

        from auto_featurs_ray.datapipe.encoding import one_hot_encode
        t = pa.table({'id': list(range(7)),
                      'cat': ['b', 'b', 'a', 'a', 'c', None, 'd']})
        out = (one_hot_encode(rd.from_arrow(t), column='cat', max_categories=2,
                              num_partitions=3)
               .to_pandas().sort_values('id').reset_index(drop=True))
        # counts: a=2, b=2, c=1, d=1 -> top-2 ties break value-asc: a, b
        assert {'cat_is_a', 'cat_is_b', 'cat_is_other'} <= set(out.columns)
        assert 'cat_is_c' not in out.columns
        assert out['cat_is_a'].tolist()[:5] == [0, 0, 1, 1, 0]
        assert out['cat_is_other'].tolist()[4] == 1      # c -> other
        assert out['cat_is_other'].tolist()[6] == 1      # d -> other
        assert pd.isna(out['cat_is_a'][5]) and pd.isna(out['cat_is_other'][5])

    def test_int8_dtype_and_validation(self):
        import pyarrow as _pa

        from auto_featurs_ray.datapipe.encoding import one_hot_encode
        t = pa.table({'id': [0], 'cat': ['x']})
        ds = one_hot_encode(rd.from_arrow(t), column='cat', max_categories=1)
        schema = ds.schema()
        assert schema.types[schema.names.index('cat_is_x')] == _pa.int8()
        with pytest.raises(ValueError, match='max_categories'):
            one_hot_encode(rd.from_arrow(t), column='cat', max_categories=0)


class TestHashEncode:
    def test_deterministic_and_signed(self):
        from auto_featurs_ray.datapipe.encoding import hash_encode
        from auto_featurs_ray.datapipe.textstats import fnv1a64_batch
        t = pa.table({'id': [0, 1, 2], 'cat': ['click', 'view', None]})
        out = (hash_encode(rd.from_arrow(t), column='cat', num_buckets=16, signed=True)
               .to_pandas().sort_values('id').reset_index(drop=True))
        h = fnv1a64_batch(['click', 'view']).view(np.uint64)
        assert out['cat_hashbucket_16'].tolist()[:2] == list((h % 16).astype(int))
        assert set(out['cat_hashsign'].dropna()) <= {-1, 1}
        assert np.isnan(out['cat_hashbucket_16'][2]) and np.isnan(out['cat_hashsign'][2])

    def test_validation(self):
        from auto_featurs_ray.datapipe.encoding import hash_encode
        t = pa.table({'cat': ['x']})
        with pytest.raises(ValueError, match='num_buckets'):
            hash_encode(rd.from_arrow(t), column='cat', num_buckets=0)


class TestTruncateNormalize:
    def test_unit_norm_and_shape(self):
        from auto_featurs_ray.datapipe.similarity import truncate_normalize
        rng = np.random.default_rng(3)
        vecs = [rng.normal(size=8).astype(np.float32).tolist() for _ in range(5)]
        vecs.append([0.0] * 8)     # zero vector -> null components
        t = pa.table({'vec_id': pa.array(range(6), pa.int64()),
                      'embedding': pa.array(vecs, pa.list_(pa.float32()))})
        out = (truncate_normalize(rd.from_arrow(t), dims=4)
               .to_pandas().sort_values('vec_id').reset_index(drop=True))
        for i in range(5):
            v = np.asarray(out['t'][i], dtype=np.float64)
            assert len(v) == 4
            np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-12)
            want = np.asarray(vecs[i][:4], dtype=np.float64)
            np.testing.assert_allclose(v, want / np.linalg.norm(want), rtol=1e-12)
        assert all(x is None or np.isnan(x) for x in out['t'][5])

    def test_short_vector_raises(self):
        from auto_featurs_ray.datapipe.similarity import truncate_normalize
        t = pa.table({'vec_id': [0], 'embedding': pa.array([[1.0, 2.0]], pa.list_(pa.float32()))})
        with pytest.raises(Exception, match='shorter'):
            truncate_normalize(rd.from_arrow(t), dims=4).to_pandas()
        with pytest.raises(ValueError, match='dims'):
            truncate_normalize(rd.from_arrow(t), dims=0)


class TestSessionSummary:
    def test_sessions_and_aggregates(self):
        from datetime import datetime

        from auto_featurs_ray.datapipe.sessions import session_summary
        H = 3600 * 1_000_000
        base = np.datetime64('2024-01-01T00:00:00', 'us').astype(np.int64)
        ts = np.array([base, base + H, base + 10 * H, base + 11 * H, base],
                      dtype=np.int64).view('datetime64[us]')
        t = pa.table({'u': ['a', 'a', 'a', 'a', 'b'],
                      'eid': pa.array(range(5), pa.int64()),
                      'ts': pa.array(ts),
                      'v': [1.0, 2.0, None, 4.0, 5.0]})
        out = (session_summary(rd.from_arrow(t), by=['u'], ts_column='ts', gap_s=2 * 3600,
                               tiebreak_columns=['eid'], value_column='v',
                               num_partitions=3)
               .to_pandas().sort_values(['u', 'session_id']).reset_index(drop=True))
        # a: sessions [0h,1h] and [10h,11h]; b: single event
        assert out['session_id'].tolist() == [1, 2, 1]
        assert out['n_events'].tolist() == [2, 2, 1]
        assert out['duration_s'].tolist() == [3600.0, 3600.0, 0.0]
        assert out['v_sum'].tolist()[0] == 3.0
        assert out['v_mean'].tolist()[1] == 4.0     # null value excluded
        assert out['v_sum'].tolist()[2] == 5.0

    def test_gap_validation(self):
        from auto_featurs_ray.datapipe.sessions import session_summary
        t = pa.table({'u': ['a'], 'ts': pa.array([0], pa.int64())})
        with pytest.raises(ValueError, match='gap_s'):
            session_summary(rd.from_arrow(t), by=['u'], ts_column='ts', gap_s=0)


class TestPivotAggregate:
    def test_counts_sums_and_other(self):
        from auto_featurs_ray.datapipe.encoding import pivot_aggregate
        t = pa.table({'u': ['a', 'a', 'a', 'b', 'b'],
                      'c': ['x', 'y', 'z', 'x', None],
                      'v': [1.0, 2.0, 4.0, 8.0, 16.0]})
        out = (pivot_aggregate(rd.from_arrow(t), by=['u'], category_column='c',
                               categories=['x', 'y'], value_column='v',
                               aggs=['count', 'sum'], num_partitions=3)
               .to_pandas().sort_values('u').reset_index(drop=True))
        assert out['c_x_count'].tolist() == [1, 1]
        assert out['c_y_count'].tolist() == [1, 0]
        assert out['c_other_count'].tolist() == [1, 1]   # 'z' and null fold to other
        assert out['v_x_sum'].tolist() == [1.0, 8.0]
        assert out['v_other_sum'].tolist() == [4.0, 16.0]

    def test_validation(self):
        from auto_featurs_ray.datapipe.encoding import pivot_aggregate
        t = pa.table({'u': ['a'], 'c': ['x']})
        ds = rd.from_arrow(t)
        with pytest.raises(ValueError, match='categories'):
            pivot_aggregate(ds, by=['u'], category_column='c', categories=[])
        with pytest.raises(ValueError, match='value_column'):
            pivot_aggregate(ds, by=['u'], category_column='c', categories=['x'],
                            aggs=['sum'])
        with pytest.raises(ValueError, match='unsupported'):
            pivot_aggregate(ds, by=['u'], category_column='c', categories=['x'],
                            aggs=['max'])


class TestGroupbyAggregate:
    def test_two_phase_matches_single_table(self):
        import pandas as pd

        from auto_featurs_ray.datapipe.relational import groupby_aggregate
        t = pa.table({'g': ['a', 'a', 'b', 'b', 'b'],
                      'v': [1.0, None, 3.0, 5.0, 7.0]})
        # many blocks -> the map-side partial path is actually exercised
        ds = rd.from_arrow([t.slice(i, 1) for i in range(5)])
        out = (groupby_aggregate(ds, by=['g'],
                                 aggs={'v': ['count', 'sum', 'mean', 'min', 'max'],
                                       '*': ['count']}, num_partitions=3)
               .to_pandas().sort_values('g').reset_index(drop=True))
        assert out['v_count'].tolist() == [1, 3]        # nulls excluded
        assert out['n_rows'].tolist() == [2, 3]         # nulls included
        assert out['v_sum'].tolist() == [1.0, 15.0]
        assert out['v_mean'].tolist() == [1.0, 5.0]
        assert out['v_min'].tolist() == [1.0, 3.0]
        assert out['v_max'].tolist() == [1.0, 7.0]

    def test_exact_count_distinct_across_blocks(self):
        from auto_featurs_ray.datapipe.relational import groupby_aggregate
        t = pa.table({'g': ['a', 'a', 'a', 'b', 'b'],
                      'v': [1.0, 1.0, None, 2.0, 3.0]})
        ds = rd.from_arrow([t.slice(i, 1) for i in range(5)])  # dupes cross blocks
        out = (groupby_aggregate(ds, by=['g'], aggs={'v': ['count_distinct']},
                                 num_partitions=3)
               .to_pandas().sort_values('g').reset_index(drop=True))
        assert out['v_count_distinct'].tolist() == [1, 2]      # null excluded

    def test_validation(self):
        from auto_featurs_ray.datapipe.relational import groupby_aggregate
        ds = rd.from_arrow(pa.table({'g': ['a'], 'v': [1.0]}))
        with pytest.raises(ValueError, match='unsupported'):
            groupby_aggregate(ds, by=['g'], aggs={'v': ['mode']})
        with pytest.raises(ValueError, match='unsupported'):
            groupby_aggregate(ds, by=['g'], aggs={'v': ['quantile_0']})
        with pytest.raises(ValueError, match='at least one'):
            groupby_aggregate(ds, by=['g'], aggs={})

    def test_kmv_approx_count_distinct(self):
        import pandas as pd

        from auto_featurs_ray.datapipe.relational import groupby_aggregate
        rng = np.random.default_rng(1)
        n = 4000
        t = pa.table({'g': pa.array(rng.choice(['a', 'b'], n)),
                      'v': pa.array(rng.integers(0, 500, n), pa.int64())})
        ds = rd.from_arrow([t.slice(i, 400) for i in range(0, n, 400)])
        out = (groupby_aggregate(ds, by=['g'],
                                 aggs={'v': ['count_distinct', 'approx_count_distinct']},
                                 num_partitions=3, kmv_k=64)
               .to_pandas().sort_values('g').reset_index(drop=True))
        err = (out['v_approx_count_distinct'] - out['v_count_distinct']).abs() \
            / out['v_count_distinct']
        assert (err < 0.3).all()
        # below-k groups are exact
        small = pa.table({'g': ['a'] * 5, 'v': pa.array([1, 2, 2, 3, 1], pa.int64())})
        o2 = (groupby_aggregate(rd.from_arrow(small), by=['g'],
                                aggs={'v': ['approx_count_distinct']}, kmv_k=64)
              .to_pandas())
        assert o2['v_approx_count_distinct'].tolist() == [3.0]

    def test_drop_duplicates_keeps_first_by_order(self):
        from auto_featurs_ray.datapipe.relational import drop_duplicates
        t = pa.table({'k': ['a', 'a', 'b', None, None], 'o': [2, 1, 5, 9, 3],
                      'v': [10, 20, 30, 40, 50]})
        out = (drop_duplicates(rd.from_arrow([t.slice(i, 1) for i in range(5)]),
                               subset=['k'], keep_order_by=['o'], num_partitions=3)
               .to_pandas().sort_values('o').reset_index(drop=True))
        assert sorted(out['v']) == [20, 30, 50]   # min-o per key; nulls one group
        from auto_featurs_ray.datapipe.relational import drop_duplicates as dd
        with pytest.raises(ValueError, match='subset'):
            dd(rd.from_arrow(t), subset=[])


class TestTopNPerGroup:
    def test_best_n_with_tiebreak(self):
        from auto_featurs_ray.datapipe.relational import top_n_per_group
        t = pa.table({'g': ['a'] * 4 + ['b'], 's': [3, 1, 3, 2, 9],
                      'id': [10, 11, 12, 13, 14]})
        out = (top_n_per_group(rd.from_arrow([t.slice(i, 1) for i in range(5)]),
                               by=['g'], order_by=['s', 'id'], n=2, descending=True,
                               num_partitions=3)
               .to_pandas().sort_values(['g', 'id']).reset_index(drop=True))
        # a: scores 3,3,2,1 -> keep both 3s; desc id tiebreak orders (12, 10)
        assert out[out.g == 'a']['id'].tolist() == [10, 12]
        assert out[out.g == 'b']['id'].tolist() == [14]

    def test_validation(self):
        from auto_featurs_ray.datapipe.relational import top_n_per_group
        ds = rd.from_arrow(pa.table({'g': ['a'], 's': [1]}))
        with pytest.raises(ValueError, match='n must'):
            top_n_per_group(ds, by=['g'], order_by=['s'], n=0)
        with pytest.raises(ValueError, match='order_by'):
            top_n_per_group(ds, by=['g'], order_by=[], n=1)


class TestMeltAndProfile:
    def test_melt_long_form(self):
        import pandas as pd

        from auto_featurs_ray.datapipe.relational import melt
        t = pa.table({'id': [1, 2], 'a': [1.0, None], 'b': [3.0, 4.0]})
        out = (melt(rd.from_arrow(t), id_columns=['id'], value_columns=['a', 'b'])
               .to_pandas().sort_values(['id', 'variable']).reset_index(drop=True))
        assert len(out) == 4
        assert out['variable'].tolist() == ['a', 'b', 'a', 'b']
        assert out['value'].tolist()[0] == 1.0 and pd.isna(out['value'].tolist()[2])

    def test_profile_stats(self):
        import pandas as pd

        from auto_featurs_ray.datapipe.relational import profile_columns
        t = pa.table({'x': [1.0, 1.0, None, 3.0]})
        ds = rd.from_arrow([t.slice(i, 2) for i in (0, 2)])
        out = profile_columns(ds, columns=['x']).to_pandas()
        r = out.iloc[0]
        assert r['n_rows'] == 4 and r['n_null'] == 1 and r['n_distinct'] == 2
        assert r['min'] == 1.0 and r['max'] == 3.0 and abs(r['mean'] - 5 / 3) < 1e-12


class TestGroupbyOrderStats:
    """Round-5 relational aggs: var/std (Chan parallel-variance combine) and
    exact interpolated median/quantiles from sorted value-list partials."""

    def _run(self, tbl, aggs, parts=4):
        import ray.data as rd

        from auto_featurs_ray.datapipe.relational import groupby_aggregate
        blocks = [tbl.slice(i, 3) for i in range(0, tbl.num_rows, 3)]
        return groupby_aggregate(rd.from_arrow(blocks), by=['g'], aggs=aggs,
                                 num_partitions=parts).to_pandas().sort_values('g')

    def test_var_std_median_match_pandas(self):
        rng = np.random.default_rng(3)
        n = 200
        g = rng.choice(['a', 'b', 'c'], n)
        v = rng.standard_normal(n) * 10
        v[rng.random(n) < 0.1] = np.nan
        tbl = pa.table({'g': pa.array(g), 'v': pa.array(v, from_pandas=True)})
        out = self._run(tbl, {'v': ['var', 'std', 'median', 'quantile_25']})
        import pandas as pd
        df = pd.DataFrame({'g': g, 'v': v})
        want = df.groupby('g')['v'].agg(['var', 'std', 'median',
                                         lambda s: s.quantile(0.25)])
        np.testing.assert_allclose(out['v_var'].to_numpy(), want['var'].to_numpy(),
                                   rtol=1e-10)
        np.testing.assert_allclose(out['v_std'].to_numpy(), want['std'].to_numpy(),
                                   rtol=1e-10)
        np.testing.assert_allclose(out['v_median'].to_numpy(), want['median'].to_numpy(),
                                   rtol=1e-12)
        np.testing.assert_allclose(out['v_quantile_25'].to_numpy(),
                                   want['<lambda_0>'].to_numpy(), rtol=1e-12)

    def test_single_row_group_var_is_null(self):
        tbl = pa.table({'g': pa.array(['a', 'b', 'b']),
                        'v': pa.array([1.0, 2.0, 4.0])})
        out = self._run(tbl, {'v': ['var', 'std', 'median']})
        a = out[out['g'] == 'a'].iloc[0]
        assert np.isnan(a['v_var']) and np.isnan(a['v_std'])
        assert a['v_median'] == 1.0
        b = out[out['g'] == 'b'].iloc[0]
        assert abs(b['v_var'] - 2.0) < 1e-12
        assert b['v_median'] == 3.0  # interpolated midpoint

    def test_quantile_only_aggs(self):
        # no combinable aggs at all: the synthetic count_all path
        tbl = pa.table({'g': pa.array(['a'] * 5),
                        'v': pa.array([5.0, 1.0, 3.0, 2.0, 4.0])})
        out = self._run(tbl, {'v': ['quantile_90']})
        assert abs(out['v_quantile_90'].iloc[0] - 4.6) < 1e-12


class TestTopKFrequent:
    def test_matches_bruteforce_with_ties_and_nulls(self):
        import pandas as pd
        import ray.data as rd

        from auto_featurs_ray.datapipe.relational import top_k_frequent

        rng = np.random.default_rng(6)
        n = 500
        g = rng.choice(['u1', 'u2', 'u3'], n)
        v = rng.choice(np.array(['a', 'b', 'c', None], dtype=object), n)
        tbl = pa.table({'g': pa.array(g), 'v': pa.array(pd.Series(v))})
        blocks = [tbl.slice(i, 97) for i in range(0, n, 97)]
        out = top_k_frequent(rd.from_arrow(blocks), by=['g'], value_column='v',
                             k=2, num_partitions=4).to_pandas()
        out = out.sort_values(['g', 'rnk']).reset_index(drop=True)

        df = pd.DataFrame({'g': g, 'v': v})
        counts = df.groupby(['g', 'v'], dropna=False).size().reset_index(name='cnt')
        counts['__null'] = counts['v'].isna()
        counts = counts.sort_values(['g', 'cnt', '__null', 'v'],
                                    ascending=[True, False, True, True])
        want = counts.groupby('g').head(2).reset_index(drop=True)
        assert len(out) == len(want)
        for got_r, want_r in zip(out.itertuples(), want.itertuples()):
            assert got_r.g == want_r.g and got_r.cnt == want_r.cnt
            assert (got_r.v == want_r.v) or (pd.isna(got_r.v) and pd.isna(want_r.v))

    def test_rank_is_one_based_and_capped(self):
        import ray.data as rd

        from auto_featurs_ray.datapipe.relational import top_k_frequent

        tbl = pa.table({'g': pa.array(['x'] * 6),
                        'v': pa.array(['a', 'a', 'a', 'b', 'b', 'c'])})
        out = top_k_frequent(rd.from_arrow(tbl), by=['g'], value_column='v',
                             k=2, num_partitions=2).to_pandas().sort_values('rnk')
        assert out['v'].tolist() == ['a', 'b']
        assert out['cnt'].tolist() == [3, 2]
        assert out['rnk'].tolist() == [1, 2]


class TestSortBy:
    def test_global_order_with_positions(self):
        import ray.data as rd

        from auto_featurs_ray.datapipe.relational import sort_by

        rng = np.random.default_rng(8)
        n = 700
        v = rng.integers(0, 50, n).astype(np.float64)
        rid = np.arange(n, dtype=np.int64)
        tbl = pa.table({'v': pa.array(v), 'rid': pa.array(rid)})
        blocks = [tbl.slice(i, 90) for i in range(0, n, 90)]
        out = sort_by(rd.from_arrow(blocks), keys=['v', 'rid'], num_partitions=5,
                      position_column='pos').to_pandas()
        out = out.sort_values('pos').reset_index(drop=True)
        assert out['pos'].tolist() == list(range(n))
        order = np.lexsort((rid, v))
        assert out['v'].tolist() == v[order].tolist()
        assert out['rid'].tolist() == rid[order].tolist()

    def test_descending_and_nulls_last(self):
        import ray.data as rd

        from auto_featurs_ray.datapipe.relational import sort_by

        tbl = pa.table({'v': pa.array([3.0, None, 1.0, 2.0, None]),
                        'rid': pa.array([0, 1, 2, 3, 4], pa.int64())})
        out = sort_by(rd.from_arrow([tbl.slice(i, 2) for i in range(0, 5, 2)]),
                      keys=[('v', 'descending'), 'rid'], num_partitions=3,
                      position_column='pos').to_pandas().sort_values('pos')
        assert out['rid'].tolist() == [0, 3, 2, 1, 4]  # 3,2,1 then nulls by rid


class TestCollectSet:
    def test_sorted_distinct_lists_with_nulls(self):
        import ray.data as rd

        from auto_featurs_ray.datapipe.relational import groupby_aggregate

        tbl = pa.table({'g': pa.array(['a', 'a', 'a', 'b', 'b', None]),
                        'v': pa.array(['z', 'x', 'z', None, 'y', 'w'])})
        blocks = [tbl.slice(i, 2) for i in range(0, 6, 2)]
        out = groupby_aggregate(rd.from_arrow(blocks), by=['g'],
                                aggs={'v': ['collect_set', 'count_distinct']},
                                num_partitions=3).to_pandas()
        out = out.sort_values('g', na_position='last').reset_index(drop=True)
        got = [list(x) for x in out['v_collect_set']]
        assert got == [['x', 'z'], ['y'], ['w']]
        assert out['v_count_distinct'].tolist() == [2, 1, 1]

    def test_numeric_values_sorted(self):
        import ray.data as rd

        from auto_featurs_ray.datapipe.relational import groupby_aggregate

        tbl = pa.table({'g': pa.array([1, 1, 1, 2], pa.int64()),
                        'v': pa.array([5.0, -1.0, 5.0, 2.0])})
        out = groupby_aggregate(rd.from_arrow(tbl), by=['g'],
                                aggs={'v': ['collect_set']},
                                num_partitions=2).to_pandas().sort_values('g')
        got = [list(x) for x in out['v_collect_set']]
        assert got == [[-1.0, 5.0], [2.0]]


class TestApproxTopKFrequent:
    def test_exact_below_capacity(self):
        import ray.data as rd

        from auto_featurs_ray.datapipe.relational import (approx_top_k_frequent,
                                                          top_k_frequent)

        rng = np.random.default_rng(13)
        n = 800
        g = rng.choice(['u1', 'u2'], n)
        v = rng.choice([f'v{i}' for i in range(12)], n)
        tbl = pa.table({'g': pa.array(g), 'v': pa.array(v)})
        blocks = [tbl.slice(i, 111) for i in range(0, n, 111)]
        exact = top_k_frequent(rd.from_arrow(blocks), by=['g'], value_column='v',
                               k=3, num_partitions=3).to_pandas()
        approx = approx_top_k_frequent(rd.from_arrow(blocks), by=['g'], value_column='v',
                                       k=3, capacity=64, num_partitions=3).to_pandas()
        exact = exact.sort_values(['g', 'rnk']).reset_index(drop=True)
        approx = approx.sort_values(['g', 'rnk']).reset_index(drop=True)
        assert (approx['err'] == 0).all()
        assert approx[['g', 'v', 'cnt', 'rnk']].equals(exact[['g', 'v', 'cnt', 'rnk']])

    def test_truncated_counts_within_err_bound(self):
        import pandas as pd
        import ray.data as rd

        from auto_featurs_ray.datapipe.relational import approx_top_k_frequent

        rng = np.random.default_rng(21)
        n = 3000
        # zipf-ish skew: true heavy hitters dominate
        v = np.minimum(rng.zipf(1.4, n), 200)
        g = np.repeat('k', n)
        tbl = pa.table({'g': pa.array(g), 'v': pa.array(v.astype(np.int64))})
        blocks = [tbl.slice(i, 250) for i in range(0, n, 250)]
        out = approx_top_k_frequent(rd.from_arrow(blocks), by=['g'], value_column='v',
                                    k=5, capacity=16, num_partitions=2).to_pandas()
        true_counts = pd.Series(v).value_counts()
        for r in out.itertuples():
            true = int(true_counts.get(r.v, 0))
            assert r.cnt <= true <= r.cnt + r.err, (r.v, r.cnt, r.err, true)
        # the unambiguous top value is still found
        assert int(out.sort_values('rnk').iloc[0]['v']) == int(true_counts.idxmax())


def test_sort_by_timestamp_leading_key():
    import ray.data as rd

    from auto_featurs_ray.datapipe.relational import sort_by

    rng = np.random.default_rng(17)
    n = 300
    ts = rng.integers(0, 10**9, n).astype('datetime64[us]')
    tbl = pa.table({'ts': pa.array(ts), 'rid': pa.array(np.arange(n, dtype=np.int64))})
    out = sort_by(rd.from_arrow([tbl.slice(i, 40) for i in range(0, n, 40)]),
                  keys=['ts', 'rid'], num_partitions=4,
                  position_column='pos').to_pandas().sort_values('pos')
    assert (out['ts'].to_numpy() == np.sort(ts)).all()


class TestIncrementalDedupIndex:
    def test_filter_new_batch_against_corpus(self, tmp_path):
        import ray.data as rd

        from auto_featurs_ray.datapipe.dedup import (build_content_index,
                                                     filter_against_index)

        corpus = pa.table({'doc_id': pa.array(range(6), pa.int64()),
                           'text': pa.array(['alpha beta', 'gamma', 'delta eps',
                                             'alpha   beta', 'zeta', 'eta'])})
        index_dir = str(tmp_path / 'cidx')
        n = build_content_index(rd.from_arrow(corpus), index_dir=index_dir,
                                num_buckets=8)
        assert n == 5  # 'alpha beta' and 'alpha   beta' normalize to one hash

        new = pa.table({'doc_id': pa.array([10, 11, 12, 13], pa.int64()),
                        'text': pa.array(['gamma', 'brand new doc', 'alpha beta',
                                          'another new one'])})
        out = filter_against_index(rd.from_arrow([new.slice(0, 2), new.slice(2, 2)]),
                                   index_dir=index_dir, num_buckets=8,
                                   concurrency=2).to_pandas()
        assert sorted(out['doc_id']) == [11, 13]

    def test_empty_index_keeps_everything(self, tmp_path):
        import ray.data as rd

        from auto_featurs_ray.datapipe.dedup import filter_against_index

        new = pa.table({'doc_id': pa.array([1, 2], pa.int64()),
                        'text': pa.array(['a', 'b'])})
        out = filter_against_index(rd.from_arrow(new),
                                   index_dir=str(tmp_path / 'none'),
                                   num_buckets=4).to_pandas()
        assert sorted(out['doc_id']) == [1, 2]


def test_normalize_text_stage():
    import ray.data as rd

    from auto_featurs_ray.datapipe.textstats import normalize_text

    tbl = pa.table({'doc_id': pa.array([0, 1, 2], pa.int64()),
                    'text': pa.array(['  Hello,   WORLD!  ', None, 'a\tb\nc'])})
    out = normalize_text(rd.from_arrow(tbl), strip_punctuation=True) \
        .to_pandas().sort_values('doc_id')
    assert out['text_norm'].tolist()[0] == 'hello world'
    assert out['text_norm'].isna().tolist() == [False, True, False]
    assert out['text_norm'].tolist()[2] == 'a b c'
    # original column untouched
    assert out['text'].tolist()[0] == '  Hello,   WORLD!  '
