"""Deterministic constants shared by Spark operators and their DuckDB
oracle twins. Generated once with random.Random(42); embedded as
literals so both engines compute identical integers.
"""

# MinHash: k=8 permutations h_j(x) = (A[j]*x + B[j]) % MINHASH_P over
# 32-bit base hashes (first 8 hex chars of md5). A[j] <= 1e6 keeps
# A*x + B < 2^63 (no overflow in either engine).
MINHASH_A = [670488, 116740, 26226, 777573, 288390, 256788, 234054, 146317]
MINHASH_B = [3163119785, 1812140441, 127978094, 939042955,
             2340505846, 946785248, 2530876844, 3460967357]
MINHASH_P = 4294967311  # smallest prime > 2^32

# LSH banding over the 8-signature: 4 bands x 2 rows.
LSH_BANDS = 4
LSH_ROWS = 2

# Polynomial rolling hash (document fingerprint): base 131 mod 1e9+7,
# over the first 64 characters. POW[i] = 131^i % M, i in [0, 64).
FP_MOD = 1_000_000_007
FP_POW = [1, 131, 17161, 2248091, 294499921, 579489385, 913108910,
          617266377, 861894827, 908221553, 977022617, 989961938,
          685012975, 736699102, 507581690, 493200928, 609321120,
          821066167, 559667128, 316393257, 447516380, 624645374,
          828543427, 539188181, 633651221, 8309370, 88527463,
          597097576, 219781910, 791430014, 677331113, 730375187,
          679148832, 968496376, 873024374, 366192196, 971177347,
          224231568, 374335205, 37911512, 966408044, 599452882,
          528326996, 210835993, 619514894, 156450547, 495021517,
          847818279, 64193772, 409384076, 629313585, 440079061,
          650356592, 196712957, 769397192, 791031452, 625119491,
          890652754, 675509962, 491804406, 426376738, 855352293,
          51149599, 700597427]
FP_LEN = 64

# BM25 hyperparameters (Elasticsearch/Lucene defaults).
BM25_K1 = 1.2
BM25_B = 0.75

# Reciprocal-rank-fusion constant (the standard k=60).
RRF_K = 60

# Hybrid fusion candidate bound: each modality is cut to its top-N by
# TakeOrdered BEFORE ranking/fusing, so rank windows see <= N rows no
# matter the corpus size (r1 ranked the full corpus in one partition).
# N is the standard candidate-list depth real hybrid engines fuse
# (ES rank_window_size-class); it only changes results for documents
# whose per-modality rank is worse than N, which contribute < 1/(60+N)
# to a fused score anyway.
HYBRID_CANDIDATES = 1000
