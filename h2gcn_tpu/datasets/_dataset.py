"""Dataset containers: planetoid pickles and GeomGCN edge-list formats.

Re-implements the reference data layer's loading semantics
(h2gcn/datasets/_dataset.py:161-680) on numpy/scipy, and replaces its
TF-tensor export (``getTensors``, _dataset.py:537-584) with a JAX/device
export: hop adjacencies become :class:`~h2gcn_tpu.sparse.SparseMatrix`
objects with TPU-backend dispatch, dense node data become ``jnp`` arrays.

Loading quirks preserved exactly (parity checklist, SURVEY.md §7):
  * citeseer isolated-node patch: test features/labels re-indexed over the
    full test range, missing rows zero-filled and marked non-valid.
  * nodes with all-zero label rows are marked non-valid and masked out of
    every split.
  * ``val_size`` validation nodes are the next ``val_size`` indices after the
    training range (when enough unlabeled nodes exist).
"""

from __future__ import annotations

import pickle as pkl
import sys
import warnings
from argparse import Namespace
from itertools import chain
from pathlib import Path

import numpy as np
import scipy.sparse as sp

from ..sparse import SparseMatrix, transforms
from ..sparse.transforms import NType


def _pkl_load(f):
    if sys.version_info > (3, 0):
        return pkl.load(f, encoding="latin1")
    return pkl.load(f)


def parse_index_file(filename):
    return [int(line.strip()) for line in open(filename)]


def sample_mask(idx, n):
    mask = np.zeros(n, dtype=bool)
    mask[np.asarray(idx, dtype=np.int64)] = True
    return mask


def graph_dict_to_adj(graph: dict) -> sp.csr_matrix:
    """Binary symmetric adjacency from a dict-of-neighbor-lists.

    Equivalent to ``nx.adjacency_matrix(nx.from_dict_of_lists(g))`` with
    ``nodelist=range(len(g))`` (reference _dataset.py:184-186): every listed
    pair becomes a 1 in both directions, duplicates collapse, self-listed
    nodes keep a diagonal 1.
    """
    n = len(graph)
    src, dst = [], []
    for u, nbrs in graph.items():
        for v in nbrs:
            src.append(u)
            dst.append(v)
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    both_r = np.concatenate([src, dst])
    both_c = np.concatenate([dst, src])
    adj = sp.csr_matrix(
        (np.ones(both_r.size, dtype=np.float32), (both_r, both_c)), shape=(n, n)
    )
    adj.sum_duplicates()
    adj.data[:] = 1.0
    return adj


class PlanetoidData:
    """Planetoid-format dataset (ind.<name>.{x,y,tx,ty,allx,ally,graph,test.index}).

    Reference: h2gcn/datasets/_dataset.py:161-590.
    """

    def __init__(self, dataset_str, dataset_path, val_size=None):
        self._sparse_data = {}
        self._dense_data = {}
        self.dataset_str = dataset_str
        self.dataset_path = dataset_path
        self.load_data(dataset_str, dataset_path, val_size=val_size)
        self._original_data = (dict(self._sparse_data), dict(self._dense_data))
        self._preprocessed_adj = None
        self._preprocessed_feature = None

    # Attribute proxying into the data dicts, mirroring the reference's
    # ``__getattribute__`` trick (_dataset.py:307-325).
    def __getattr__(self, name):
        for store in ("_sparse_data", "_dense_data"):
            d = object.__getattribute__(self, store)
            if name in d:
                return d[name]
        raise AttributeError(name)

    def __setattr__(self, name, value):
        if name.startswith("_"):
            object.__setattr__(self, name, value)
            return
        for store in ("_sparse_data", "_dense_data"):
            d = getattr(self, store, None)
            if d is not None and name in d:
                d[name] = value
                return
        object.__setattr__(self, name, value)

    # ------------------------------------------------------------------ load
    def load_data(self, dataset_str, dataset_path="data", val_size=None):
        names = ["x", "y", "tx", "ty", "allx", "ally", "graph"]
        objects = []
        for name in names:
            with open(f"{dataset_path}/{dataset_str}.{name}", "rb") as f:
                objects.append(_pkl_load(f))
        x, y, tx, ty, allx, ally, graph = objects
        test_idx_reorder = parse_index_file(
            f"{dataset_path}/{dataset_str}.test.index"
        )
        test_idx_range = np.sort(test_idx_reorder)

        # citeseer isolated-node patch (reference _dataset.py:226-242)
        test_idx_range_full = range(min(test_idx_reorder), max(test_idx_reorder) + 1)
        if len(test_idx_range_full) != len(test_idx_range):
            print(f"Patch for citeseer dataset applied for {dataset_str}")
            tx_extended = sp.lil_matrix((len(test_idx_range_full), x.shape[1]))
            tx_extended[test_idx_range - min(test_idx_range), :] = tx
            tx = tx_extended
            ty_extended = np.zeros((len(test_idx_range_full), y.shape[1]))
            ty_extended[test_idx_range - min(test_idx_range), :] = ty
            ty = ty_extended
            self._non_valid_samples = set(test_idx_range_full) - set(test_idx_range)
        else:
            self._non_valid_samples = set()

        features = sp.vstack((allx, tx)).tolil()
        features[test_idx_reorder, :] = features[test_idx_range, :]
        adj = graph_dict_to_adj(graph)

        labels = np.vstack((ally, ty))
        labels[test_idx_reorder, :] = labels[test_idx_range, :]

        # Unlabeled nodes are non-valid (citeseer/GeomGCN label bug guard)
        self._non_valid_samples = self._non_valid_samples.union(
            set(np.where(labels.sum(1) == 0)[0].tolist())
        )

        idx_test = test_idx_range.tolist()
        idx_train = range(len(y))
        train_mask = sample_mask(idx_train, labels.shape[0])
        test_mask = sample_mask(idx_test, labels.shape[0])
        val_mask = ~(train_mask | test_mask)
        if val_size is not None:
            if val_mask.sum() > val_size:
                val_mask = sample_mask(range(len(y), len(y) + val_size), labels.shape[0])
            else:
                print(f"Val set size set to {val_mask.sum()} (insufficient samples).")
        wild_mask = ~(train_mask | val_mask | test_mask)

        for n_i in self._non_valid_samples:
            for mask, name in ((train_mask, "training"), (test_mask, "test"),
                               (val_mask, "val")):
                if mask[n_i]:
                    warnings.warn(f"Non valid samples detected in {name} set")
                    mask[n_i] = False
                    break
            wild_mask[n_i] = False

        def masked(labels, mask):
            out = np.zeros(labels.shape)
            out[mask, :] = labels[mask, :]
            return out

        self._sparse_data["sparse_adj"] = adj
        self._sparse_data["features"] = features.tocsr()
        self._dense_data["y_all"] = labels
        self._dense_data["train_mask"] = train_mask
        self._dense_data["val_mask"] = val_mask
        self._dense_data["test_mask"] = test_mask
        self._dense_data["wild_mask"] = wild_mask
        self._dense_data["y_train"] = masked(labels, train_mask)
        self._dense_data["y_val"] = masked(labels, val_mask)
        self._dense_data["y_test"] = masked(labels, test_mask)
        self._dense_data["y_wild"] = masked(labels, wild_mask)

    def set_mixhop_partition(self, val_size=500):
        """Rebuild the split the way the MixHop reference reader does
        (baselines/mixhop/mixhop_dataset.py:184-194): train = ALL nodes
        before the validation window — i.e. the labeled train set PLUS the
        wild nodes — val = the next ``val_size`` ids minus train/test
        overlap, test = the stored test indices.  This is the partition
        every reference MixHop planetoid run trains under (its trainer has
        no notion of the 140-node planetoid train mask)."""
        labels = self.y_all
        n = labels.shape[0]
        test_mask = self.test_mask.copy()
        num_test = int(test_mask.sum())
        num_train = n - val_size - num_test
        train_mask = np.zeros(n, bool)
        train_mask[:num_train] = True
        val_mask = np.zeros(n, bool)
        val_mask[num_train:min(num_train + val_size, n)] = True
        val_mask &= ~train_mask & ~test_mask
        wild_mask = ~(train_mask | val_mask | test_mask)

        def masked(mask):
            out = np.zeros(labels.shape)
            out[mask, :] = labels[mask, :]
            return out

        self._dense_data["train_mask"] = train_mask
        self._dense_data["val_mask"] = val_mask
        self._dense_data["wild_mask"] = wild_mask
        self._dense_data["y_train"] = masked(train_mask)
        self._dense_data["y_val"] = masked(val_mask)
        self._dense_data["y_wild"] = masked(wild_mask)

    def reload_data(self):
        self._sparse_data, self._dense_data = (
            dict(self._original_data[0]),
            dict(self._original_data[1]),
        )
        self._preprocessed_adj = None
        self._preprocessed_feature = None

    # ------------------------------------------------------------- properties
    @property
    def labels(self):
        idx, labels = np.where(self.y_all)
        labels = labels.astype(np.int32)
        if len(idx) != self.num_samples:  # unlabeled nodes → label -1
            part = labels
            labels = np.zeros(self.num_samples, dtype=np.int32) - 1
            labels[idx] = part
        return labels

    @property
    def num_labels(self):
        return self.y_all.shape[1]

    @property
    def num_samples(self):
        return self.features.shape[0]

    @property
    def feature_dim(self):
        return self.features.shape[1]

    @property
    def label_count(self):
        return self.y_train.sum(0) + self.y_val.sum(0) + self.y_test.sum(0)

    def sort_label_by_size(self, descending=True):
        """Class ids ordered by size (reference _dataset.py:432-436)."""
        order = np.argsort(np.asarray(self.label_count))
        return order[::-1] if descending else order

    def feature_sample_eligible(self, label_count):
        """Can this dataset donate features for the given class sizes?
        (reference _dataset.py:457-461)"""
        own = np.sort(np.asarray(self.label_count))[::-1]
        want = np.sort(np.asarray(label_count))[::-1]
        if len(want) > len(own):
            return False
        return bool(np.all(want <= own[: len(want)]))

    def get_sample_mask(self, label=slice(None), *scopes):
        """Mask of nodes with the given label(s) in the given scopes
        (reference _dataset.py:380-398)."""
        if len(scopes) == 0:
            scopes = ("train", "val", "test")
        if not isinstance(label, slice):
            label = np.array(label).reshape(-1)
        mask = np.zeros(self.num_samples, dtype=bool)
        for scope in scopes:
            y_scope = self._dense_data[f"y_{scope}"]
            mask |= np.any(y_scope[:, label] == 1, axis=1)
        return mask

    def split_training_set(self, splits=2):
        """Round-robin per-class split of the training set
        (reference _dataset.py:463-474)."""
        self.train_mask_splits = np.zeros(
            (splits,) + self.train_mask.shape, dtype=self.train_mask.dtype
        )
        self.y_train_splits = np.zeros(
            (splits,) + self.y_train.shape, dtype=self.y_train.dtype
        )
        for label in range(self.y_train.shape[1]):
            available = np.where(self.y_train[:, label])[0]
            for i, index in enumerate(available):
                self.train_mask_splits[i % splits, index] = (
                    self.train_mask[index]
                )
                self.y_train_splits[i % splits, index, :] = (
                    self.y_train[index, :]
                )

    # ---------------------------------------------------------- preprocessing
    def adj_add_eye(self):
        self.sparse_adj = transforms.add_eye(self.sparse_adj)
        self._preprocessed_adj = True

    def adj_remove_eye(self):
        self.sparse_adj = transforms.remove_eye(self.sparse_adj)
        self._preprocessed_adj = True

    def row_normalize_features(self):
        self.features = transforms.row_normalize(self.features)
        self._preprocessed_feature = True

    def set_identity_features(self):
        """Replace node features with the identity (structure-only runs)."""
        self.features = sp.eye(self.num_samples, format="csr", dtype=np.float32)

    def set_label_one_hot_features(self):
        """Replace node features with (train-masked) one-hot labels."""
        feats = np.zeros_like(self.y_all)
        feats[self.train_mask, :] = self.y_all[self.train_mask, :]
        self.features = sp.csr_matrix(feats.astype(np.float32))

    def preprocess_gcn(self, add_eye=True):
        """A+I sym-normalized + row-normalized features (GCN convention)."""
        if self._preprocessed_adj or self._preprocessed_feature:
            self.reload_data()
        if add_eye:
            self.adj_add_eye()
        self.sparse_adj = transforms.normalize(self.sparse_adj, NType.SYM_NORMALIZED)
        self.row_normalize_features()
        self._preprocessed_adj = "GCN"
        self._preprocessed_feature = "GCN"

    # --------------------------------------------------------- device export
    # densifying features beyond this element count is refused — an n×n
    # identity-feature matrix at 100K nodes would silently materialize 40GB
    _DENSE_FEATURE_GUARD = 250_000_000

    def get_tensors(
        self,
        get_adj_hops=None,
        get_adj_norm_hops=None,
        supports=None,
        norm_type: NType = NType.SYM_NORMALIZED,
        dtype=np.float32,
        backend: str = "auto",
        sparse_features: bool = False,
        precompute_workers: int = 1,
        reorder: str | None = None,
    ) -> Namespace:
        """Export device tensors — the JAX analogue of reference ``getTensors``
        (_dataset.py:537-584).

        ``get_adj_norm_hops``: list of hop groups like ``["1", "2"]`` or
        ``["0,1", "2"]``; each group's exact-hop matrices are summed and then
        normalized (``norm_type``), yielding one SparseMatrix per group.
        ``get_adj_hops`` does the same without normalization (dense stack).
        ``supports``: an explicit list of scipy support matrices exported
        directly as ``adj_hops`` (GCN ``Â = sym_norm(A+I)``, Chebyshev
        polynomials, ...).
        ``sparse_features`` keeps X as a segment-backed SparseMatrix (the
        reference's SparseDense input path, h2gcn/models/_layers.py:22-52) —
        required for identity-scale features on large graphs.
        ``precompute_workers > 1`` routes the exact-hop split through the
        distributed row-sharded spgemm (parallel/spgemm.py).
        ``reorder`` ("rcm" | "cluster") applies a tile-clustering node
        permutation to every exported tensor (graph, features, labels,
        masks) so the blocked SpMM backends touch fewer tiles; the
        permutation is computed on the union pattern of the matrices the
        model will actually aggregate over (hop matrices / supports — not
        the raw adjacency), exported as ``t.node_perm``, and saved
        predictions / activations are mapped back to original node order by
        the runtime. Order-insensitive for training math — purely a layout
        optimization (no reference analogue; scipy SpMM has no tile
        structure).
        """
        import jax.numpy as jnp

        def _hop_groups(spec):
            return [[int(x) for x in elem.split(",")] for elem in spec]

        def _pad_splits(splits, kmax):
            # nhood_split terminates early when reachability saturates
            # (transforms.py); missing exact-hop levels are empty matrices
            # (no node has a neighbor at that exact distance). The reference
            # would crash with IndexError here (_dataset.py:571) — padding
            # with zero matrices is the correct semantics.
            n = self.num_samples
            while len(splits) < kmax + 1:
                splits.append(sp.csr_matrix((n, n), dtype=splits[0].dtype))
            return splits

        # ---- host-side assembly (scipy) — everything the permutation must
        # see is built BEFORE any device export
        hops_unnorm = None
        if get_adj_hops:
            groups = _hop_groups(get_adj_hops)
            kmax = max(chain(*groups))
            n = self.num_samples
            if n * n * len(groups) > self._DENSE_FEATURE_GUARD:
                # unnormalized hops export a dense [n, G, n] stack (the
                # reference's getAdjHops semantics) — refuse past the guard
                # instead of a silent multi-GB materialization
                raise ValueError(
                    f"get_adj_hops would materialize a dense "
                    f"[{n}, {len(groups)}, {n}] stack "
                    f"({n * n * len(groups):,} elements) — use the "
                    "normalized sparse hop pipeline (get_adj_norm_hops) "
                    "at this scale")
            splits = _pad_splits(
                transforms.nhood_split(self.sparse_adj, kmax,
                                       n_workers=precompute_workers), kmax
            )
            hops_unnorm = [sum(splits[i] for i in g) for g in groups]
        normed = None
        if get_adj_norm_hops:
            groups = _hop_groups(get_adj_norm_hops)
            kmax = max(chain(*groups))
            if norm_type == NType.CHEBY:
                splits = transforms.chebyshev_polynomials(
                    self.sparse_adj, kmax, eigenvalue=2
                )
                normed = [sum(splits[i] for i in g) for g in groups]
            else:
                splits = _pad_splits(
                    transforms.nhood_split(self.sparse_adj, kmax,
                                           n_workers=precompute_workers),
                    kmax,
                )
                summed = [sum(splits[i] for i in g) for g in groups]
                normed = [transforms.normalize(m, norm_type) for m in summed]

        perm = None
        if reorder:
            parts = (normed if normed is not None
                     else list(supports) if supports is not None
                     else hops_unnorm)
            if parts:
                pattern = sum(
                    (abs(sp.csr_matrix(p)) for p in parts[1:]),
                    abs(sp.csr_matrix(parts[0])))
            else:
                pattern = self.sparse_adj
            perm = transforms.cluster_order(pattern, method=reorder)

        def _permuted(m):
            return transforms.permute_graph(m, perm) if perm is not None else m

        t = Namespace()
        t.adj = SparseMatrix.from_scipy(
            _permuted(self.sparse_adj).astype(dtype), backend=backend
        )
        if sparse_features:
            feats = sp.csr_matrix(self.features)
            if perm is not None:
                feats = feats[perm]
            t.features = SparseMatrix.from_scipy(
                feats.astype(dtype), backend="segment"
            )
        else:
            n_elems = int(self.features.shape[0]) * int(self.features.shape[1])
            if n_elems > self._DENSE_FEATURE_GUARD:
                raise ValueError(
                    f"densifying a {self.features.shape} feature matrix "
                    f"({n_elems:,} elements) would exhaust device memory — "
                    "pass sparse_features=True (CLI: --sparse_features) to "
                    "keep X on the sparse SpMM path")
            feats_np = np.asarray(self.features.todense(), dtype=dtype)
            if perm is not None:
                feats_np = feats_np[perm]
            t.features = jnp.asarray(feats_np)

        if supports is not None:
            t.adj_hops = [
                SparseMatrix.from_scipy(_permuted(m).astype(dtype),
                                        backend=backend)
                for m in supports
            ]
        if hops_unnorm is not None:
            merged = np.stack(
                [np.asarray(_permuted(m).todense()) for m in hops_unnorm],
                axis=1,
            )
            t.adj_hops = jnp.asarray(merged.astype(dtype))
        if normed is not None:
            t.adj_hops = [
                SparseMatrix.from_scipy(_permuted(m).astype(dtype),
                                        backend=backend)
                for m in normed
            ]

        for key, value in self._dense_data.items():
            t_val = np.asarray(value, dtype=dtype)
            if perm is not None and t_val.shape[:1] == (self.num_samples,):
                t_val = t_val[perm]
            setattr(t, key, jnp.asarray(t_val))
        labels_np = np.asarray(self.labels)
        if perm is not None:
            labels_np = labels_np[perm]
            t.node_perm = perm
        t.labels = jnp.asarray(labels_np)
        return t


class GeomGCNData(PlanetoidData):
    """GeomGCN edge-list datasets (texas/wisconsin/cornell/chameleon/... ).

    Reference: h2gcn/datasets/_dataset.py:592-680, with the film 932-dim
    binary-feature uint16 overflow fix.
    """

    def __init__(self, dataset_str, dataset_path, splits_file_path=None,
                 directed_graph=False,
                 adj_filename="out1_graph_edges.txt",
                 feature_filename="out1_node_feature_label.txt"):
        self._sparse_data = {}
        self._dense_data = {}
        self.dataset_str = dataset_str
        self.dataset_path = dataset_path
        self.load_data(dataset_str, dataset_path, splits_file_path,
                       directed_graph, adj_filename, feature_filename)
        self._original_data = (dict(self._sparse_data), dict(self._dense_data))
        self._preprocessed_adj = None
        self._preprocessed_feature = None

    def load_data(self, dataset_str, dataset_path, splits_file_path=None,
                  directed_graph=False,
                  adj_filename="out1_graph_edges.txt",
                  feature_filename="out1_node_feature_label.txt"):
        feat_path = Path(dataset_path) / feature_filename
        adj_path = Path(dataset_path) / adj_filename

        features_dict, labels_dict = {}, {}
        with open(feat_path) as f:
            f.readline()
            for line in f:
                nid, feat, label = line.rstrip().split("\t")
                nid = int(nid)
                assert nid not in features_dict
                if dataset_str == "film":
                    blank = np.zeros(932, dtype=np.uint8)
                    blank[np.array(feat.split(","), dtype=np.uint16)] = 1
                    features_dict[nid] = blank
                else:
                    features_dict[nid] = np.array(feat.split(","), dtype=np.uint8)
                labels_dict[nid] = int(label)

        src, dst = [], []
        nodes = set()
        with open(adj_path) as f:
            f.readline()
            for line in f:
                u, v = (int(t) for t in line.rstrip().split("\t"))
                src.append(u)
                dst.append(v)
                nodes.add(u)
                nodes.add(v)
        node_list = sorted(nodes)
        remap = {nid: i for i, nid in enumerate(node_list)}
        n = len(node_list)
        r = np.array([remap[u] for u in src])
        c = np.array([remap[v] for v in dst])
        if not directed_graph:
            r, c = np.concatenate([r, c]), np.concatenate([c, r])
        adj = sp.csr_matrix(
            (np.ones(r.size, dtype=np.float32), (r, c)), shape=(n, n)
        )
        adj.sum_duplicates()
        adj.data[:] = 1.0

        features = np.stack([features_dict[nid] for nid in node_list]).astype(
            np.float32
        )
        labels = np.array([labels_dict[nid] for nid in node_list], dtype=np.int32)
        y_all = np.zeros((n, labels.max() + 1))
        y_all[np.arange(n), labels] = 1

        self._sparse_data["sparse_adj"] = adj
        self._sparse_data["features"] = sp.csr_matrix(features)
        self._dense_data["y_all"] = y_all

        if splits_file_path:
            self.load_splits(splits_file_path)
        else:
            for key in ("train_mask", "val_mask", "test_mask", "wild_mask"):
                self._dense_data[key] = np.zeros(n, dtype=bool)
            self._derive_split_labels()
            self.splitted = False

    def load_splits(self, splits_file_path):
        """Load a GeomGCN ``*_split_0.6_0.2_N.npz`` split file.

        Reference: experiments/h2gcn/utils/dataset.py:682-707.
        """
        with np.load(splits_file_path) as s:
            self._dense_data["train_mask"] = s["train_mask"].astype(bool)
            self._dense_data["val_mask"] = s["val_mask"].astype(bool)
            self._dense_data["test_mask"] = s["test_mask"].astype(bool)
        self._dense_data["wild_mask"] = ~(
            self.train_mask | self.val_mask | self.test_mask
        )
        self._derive_split_labels()
        self.splitted = True

    def _derive_split_labels(self):
        labels = self._dense_data["y_all"]
        for scope in ("train", "val", "test", "wild"):
            mask = self._dense_data[f"{scope}_mask"]
            y = np.zeros(labels.shape)
            y[mask, :] = labels[mask, :]
            self._dense_data[f"y_{scope}"] = y

    @property
    def label_count(self):
        if not getattr(self, "splitted", False):
            return self.y_all.sum(0)
        return super().label_count
