"""FROZEN BPE merge table — trained by tools/build_bpe_merges.py
(distributed trainer operators/bpe.bpe_merges, property-verified vs
the sequential reference) on /root/testdata/sf0.01 documents, n_merges=24,
min_freq=2. DO NOT EDIT BY HAND; retrain to change. (sym_a, sym_b,
pair_freq) in merge order — application order is load-bearing."""

BPE_MERGES = [
    ('e', 'r', 4568),
    ('e', '</w>', 4473),
    ('n', '</w>', 2834),
    ('er', '</w>', 2779),
    ('o', 'w', 2747),
    ('ow', '</w>', 2747),
    ('o', 'r', 2696),
    ('s', 't', 2676),
    ('h', '</w>', 1884),
    ('a', 't', 1845),
    ('l', 'u', 1831),
    ('i', 'n', 1796),
    ('a', '</w>', 1788),
    ('g', '</w>', 1777),
    ('y', '</w>', 1767),
    ('a', 'r', 1758),
    ('p', 'ar', 1758),
    ('t', '</w>', 1750),
    ('i', 'n</w>', 964),
    ('j', 'o', 964),
    ('jo', 'in</w>', 964),
    ('a', 's', 947),
    ('as', 'h</w>', 947),
    ('h', 'ash</w>', 947),
]
