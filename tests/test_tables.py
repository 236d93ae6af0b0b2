import numpy as np

from miniprot_tpu import tables


def test_alphabet_roundtrip():
    T = tables.get_tables(1)
    assert T.nt4[ord("A")] == 0 and T.nt4[ord("t")] == 3 and T.nt4[ord("N")] == 4
    assert T.aa20[ord("A")] == 0 and T.aa20[ord("*")] == 20 and T.aa20[ord("X")] == 21
    assert T.aa20[ord("J")] == 21  # unknown -> X
    assert T.aa13[ord("*")] == 14 and T.aa13[ord("B")] == 15


def test_standard_code_translation():
    T = tables.get_tables(1)
    # ATG -> M, TAA -> *, TGG -> W  (codon = b0<<4|b1<<2|b2, ACGT=0123)
    atg = 0 << 4 | 3 << 2 | 2
    taa = 3 << 4 | 0 << 2 | 0
    tgg = 3 << 4 | 2 << 2 | 2
    assert tables.AA_I2C[T.codon[atg]] == "M"
    assert tables.AA_I2C[T.codon[taa]] == "*"
    assert tables.AA_I2C[T.codon[tgg]] == "W"


def test_vertebrate_mito_differs():
    T2 = tables.get_tables(2)
    aga = 0 << 4 | 2 << 2 | 0
    assert tables.AA_I2C[T2.codon[aga]] == "*"  # AGA is stop in table 2


def test_blosum_symmetry_and_stop():
    m = tables.BLOSUM62
    assert (m == m.T).all()
    mat = m.copy()
    tables.set_stop_sc(mat, 23)
    assert mat[20, 0] == -23 and mat[0, 20] == -23
    assert mat[20, 20] == 1  # preserved


def test_mp_log2():
    # spot values against the closed-form C approximation
    for x in (2.0, 3.0, 10.0, 1000.0, 123456.0):
        got = float(tables.mp_log2_f32(x))
        assert abs(got - np.log2(x)) < 0.02


def test_splice_models():
    assert tables.splice_model_scores(2).tolist() == [8, 15, 21, 30, 4, 4]
    assert tables.splice_model_scores(1).tolist() == [8, 15, 21, 30, 0, 0]
    assert tables.splice_model_scores(0).tolist() == [0] * 6
