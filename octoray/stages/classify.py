"""Sequence classification stages: clade assignment + motif extraction.

Reference analogues (SURVEY.md §2.9):
  X1  octoFLU clade classifier — the reference shells out to a BLAST+
      tree pipeline in 5000-sequence chunks (script.py:175-277).  Here
      the same role is an ACTOR-POOL ``map_batches`` stage: the
      reference panel (clade -> representative sequence) is turned
      into a k-mer profile matrix ONCE per actor in ``__init__``; each
      batch is one vectorized profile x panel cosine argmax.  Output
      mirrors octoFLU's 4-column table (seqid, segment_subtype, clade,
      gl_clade) so the result feeds ``prep_table`` exactly as the
      reference uploads it (ui.py:209-255).
  X2  flutile motif extraction (script.py:280-307, ui.py:296-318) —
      dna->aa translation, signal-peptide strip, then per-subtype
      1-based position picks; stateless vectorized stage with the
      reference's own position lists.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

# --- dna -> aa (standard code; flutile's conversion="dna2aa") ---------
_CODON = {}
_BASES = "TCAG"
_AA = "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG"
for _i, _b1 in enumerate(_BASES):
    for _j, _b2 in enumerate(_BASES):
        for _k, _b3 in enumerate(_BASES):
            _CODON[_b1 + _b2 + _b3] = _AA[_i * 16 + _j * 4 + _k]


def dna_to_aa(seq: str) -> str:
    s = seq.upper().replace("U", "T")
    return "".join(
        _CODON.get(s[i : i + 3], "X") for i in range(0, len(s) - 2, 3)
    )


# --- X2: motif extraction ---------------------------------------------
# position lists from the reference (ui.py:300-306, 320):
MOTIF_POSITIONS: Dict[str, Dict[str, List[int]]] = {
    "H1": {
        "sa_motif": [124, 125, 155, 157, 159, 160, 162, 163, 164],
        "sb_motif": [153, 156, 189, 190, 193, 195],
        "ca1_motif": [166, 170, 204, 237],
        "ca2_motif": [137, 140, 142, 221, 222],
        "cb_motif": [70, 71, 73, 74, 75, 115],
    },
    "H3": {"h3_motif": [145, 155, 156, 158, 159, 189]},
}
# mature-peptide numbering: the signal peptide is stripped first
# (flutile keep_signal=False); canonical signal lengths
SIGNAL_LEN = {"H1": 17, "H3": 16}


def extract_motifs(seqs, *, subtype: str, id_col: str = "seqid",
                   seq_col: str = "dnaseq", translate: bool = True):
    """Dataset[(seqid, dnaseq)] -> one row per (seqid, motif_name,
    motif).  Positions are 1-based on the mature (signal-stripped)
    protein; sequences too short for a position yield '-' at that slot
    (flutile's gap convention)."""
    positions = MOTIF_POSITIONS[subtype]
    sig = SIGNAL_LEN[subtype]

    def f(t: pa.Table) -> pa.Table:
        ids, names, motifs = [], [], []
        for sid, seq in zip(t.column(id_col).to_pylist(), t.column(seq_col).to_pylist()):
            aa = dna_to_aa(seq) if translate else seq
            mature = aa[sig:]
            for mname, pos in positions.items():
                motif = "".join(
                    mature[p - 1] if p - 1 < len(mature) else "-" for p in pos
                )
                ids.append(sid)
                names.append(mname)
                motifs.append(motif)
        return pa.table(
            {
                id_col: pa.array(ids, pa.string()),
                "motif_name": pa.array(names, pa.string()),
                "motif": pa.array(motifs, pa.string()),
            }
        )

    return seqs.map_batches(f, batch_format="pyarrow")


# --- X1: k-mer clade classifier (actor pool) --------------------------
_KMER = 4
_BASE_IDX = {"A": 0, "C": 1, "G": 2, "T": 3}


def _kmer_profile(seq: str) -> np.ndarray:
    """L2-normalized 4^k k-mer count vector (numpy, no Python dict)."""
    idx = np.array([_BASE_IDX.get(c, -1) for c in seq.upper()], dtype=np.int64)
    valid = idx >= 0
    counts = np.zeros(4 ** _KMER, dtype=np.float64)
    if valid.sum() >= _KMER:
        # rolling base-4 code over windows with no invalid base
        codes = np.zeros(len(idx) - _KMER + 1, dtype=np.int64)
        ok = np.ones(len(codes), dtype=bool)
        for j in range(_KMER):
            w = idx[j : j + len(codes)]
            codes = codes * 4 + np.where(w >= 0, w, 0)
            ok &= w >= 0
        np.add.at(counts, codes[ok], 1.0)
    n = np.linalg.norm(counts)
    return counts / n if n else counts


class CladeClassifier:
    """Actor-pool stage (X1): batch k-mer cosine argmax vs the panel.

    ``panel`` rows: (clade, gl_clade, segment_subtype, sequence) — the
    analogue of octoFLU's reference fasta, built once per actor into a
    (P, 4^k) matrix.  Batches of ~5000 mirror the reference's chunking
    (script.py:235).
    """

    def __init__(self, panel: Sequence[Tuple[str, str, str, str]],
                 *, id_col: str = "seqid", seq_col: str = "dnaseq"):
        self.id_col = id_col
        self.seq_col = seq_col
        self.meta = [(c, g, s) for c, g, s, _ in panel]
        self.matrix = np.stack([_kmer_profile(seq) for _, _, _, seq in panel])

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        profiles = np.stack(
            [_kmer_profile(s) for s in batch.column(self.seq_col).to_pylist()]
        ) if ids else np.zeros((0, 4 ** _KMER))
        scores = profiles @ self.matrix.T  # (n, P)
        best = scores.argmax(axis=1) if len(ids) else np.array([], dtype=int)
        return pa.table(
            {
                "seqid": pa.array(ids, pa.string()),
                "segment_subtype": pa.array([self.meta[b][2] for b in best], pa.string()),
                "clade": pa.array([self.meta[b][0] for b in best], pa.string()),
                "gl_clade": pa.array([self.meta[b][1] for b in best], pa.string()),
                "score": pa.array(scores.max(axis=1) if len(ids) else [], pa.float64()),
            }
        )


def classify_clades(seqs, panel, *, batch_size: int = 5000, concurrency=(1, 4),
                    id_col: str = "seqid", seq_col: str = "dnaseq"):
    """octoFLU-shaped classification: Dataset[(seqid, dnaseq)] ->
    (seqid, segment_subtype, clade, gl_clade, score)."""
    return seqs.map_batches(
        CladeClassifier,
        fn_constructor_kwargs=dict(panel=panel, id_col=id_col, seq_col=seq_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# --- deterministic synthetic panel + queries --------------------------
def synth_panel(seed: int = 7) -> List[Tuple[str, str, str, str]]:
    """Reference panel: one deterministic 300-mer per (clade, gl)."""
    from octoray.sources.webtext import _streams

    clades = [
        ("1A.1.1", "1A.1.1", "H1"), ("1A.2", "1A.2", "H1"),
        ("1B.2.1", "1B.2.1", "H1"), ("3.1990.4.1", "3.1990.4.1", "H3"),
        ("2010.1", "3.2010.1", "H3"), ("C.3", "C.3", "N1"),
    ]
    panel = []
    for i, (c, g, s) in enumerate(clades):
        draws = _streams(np.arange(300, dtype=np.uint64) + np.uint64(i * 1000),
                         seed ^ 0xC1ADE, 1)[:, 0]
        seq = "".join("ACGT"[int(d) & 3] for d in draws)
        panel.append((c, g, s, seq))
    return panel


def synth_query_seqs(n: int, panel, *, seed: int = 7, mutations: int = 30) -> pa.Table:
    """Queries derived from panel members by point mutations — ground
    truth = the source panel clade (recoverable by the classifier)."""
    from octoray.sources.webtext import _streams

    ids, seqs, truth = [], [], []
    r = _streams(np.arange(n, dtype=np.uint64), seed ^ 0x9E9, 2 + mutations * 2)
    for i in range(n):
        p = int(r[i, 0]) % len(panel)
        clade, _, _, seq = panel[p]
        s = list(seq)
        for m in range(mutations):
            pos = int(r[i, 2 + m * 2]) % len(s)
            s[pos] = "ACGT"[int(r[i, 3 + m * 2]) & 3]
        ids.append(f"seq{i:05d}")
        seqs.append("".join(s))
        truth.append(clade)
    return pa.table(
        {
            "seqid": pa.array(ids, pa.string()),
            "dnaseq": pa.array(seqs, pa.string()),
            "true_clade": pa.array(truth, pa.string()),
        }
    )
