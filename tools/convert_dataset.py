"""Convert OGB / PyG datasets to the framework's .npz archives.

Run on a machine with network access + ogb/torch_geometric installed:

    python tools/convert_dataset.py --dataset arxiv --out datasets/arxiv.npz

Archive format (see vq_gnn_tpu/graph/datasets.py:load_npz):
  num_nodes, num_classes, edge_index [2, E] (src, dst), x [N, F] f32,
  y ([N] int or [N, C] f32), train_mask/val_mask/test_mask [N] bool.
Link datasets additionally store split edges:
  train_pos/valid_pos/valid_neg/test_pos/test_neg [n, 2].
"""

import argparse

import numpy as np


def convert_node(name: str, root: str):
    from ogb.nodeproppred import PygNodePropPredDataset

    ds = PygNodePropPredDataset(name=f"ogbn-{name}", root=root)
    data = ds[0]
    split = ds.get_idx_split()
    n = data.num_nodes
    masks = {}
    for k, key in [("train_mask", "train"), ("val_mask", "valid"), ("test_mask", "test")]:
        m = np.zeros(n, bool)
        m[split[key].numpy()] = True
        masks[k] = m
    return dict(
        num_nodes=n,
        num_classes=ds.num_classes,
        edge_index=data.edge_index.numpy(),
        x=data.x.numpy().astype(np.float32),
        y=data.y.numpy().reshape(-1),
        **masks,
    )


def convert_pyg(name: str, root: str):
    import torch_geometric.datasets as D

    cls = {"flickr": D.Flickr, "yelp": D.Yelp, "reddit": D.Reddit}[name]
    data = cls(root=root)[0]
    return dict(
        num_nodes=data.num_nodes,
        num_classes=int(data.y.max()) + 1 if data.y.dim() == 1 else data.y.shape[1],
        edge_index=data.edge_index.numpy(),
        x=data.x.numpy().astype(np.float32),
        y=data.y.numpy(),
        train_mask=data.train_mask.numpy(),
        val_mask=data.val_mask.numpy(),
        test_mask=data.test_mask.numpy(),
    )


def convert_link(name: str, root: str):
    from ogb.linkproppred import PygLinkPropPredDataset

    ds = PygLinkPropPredDataset(name=f"ogbl-{name}", root=root)
    data = ds[0]
    se = ds.get_edge_split()
    out = dict(
        num_nodes=data.num_nodes,
        num_classes=0,
        edge_index=data.edge_index.numpy(),
        x=data.x.numpy().astype(np.float32),
        y=np.zeros(data.num_nodes, np.int32),
    )
    if name == "collab":
        out.update(
            train_pos=se["train"]["edge"].numpy(),
            valid_pos=se["valid"]["edge"].numpy(),
            valid_neg=se["valid"]["edge_neg"].numpy(),
            test_pos=se["test"]["edge"].numpy(),
            test_neg=se["test"]["edge_neg"].numpy(),
        )
    elif name == "citation2":
        import torch

        # eval_train = fixed random 86596-edge subset (main_link.py v2:336-343)
        torch.manual_seed(12345)
        idx = torch.randperm(se["train"]["source_node"].numel())[:86596]
        pair = lambda s, t: np.stack([s.numpy(), t.numpy()], axis=1)
        out.update(
            train_pos=pair(
                se["train"]["source_node"][idx], se["train"]["target_node"][idx]
            ),
            valid_pos=pair(se["valid"]["source_node"], se["valid"]["target_node"]),
            valid_neg=se["valid"]["target_node_neg"].numpy(),
            test_pos=pair(se["test"]["source_node"], se["test"]["target_node"]),
            test_neg=se["test"]["target_node_neg"].numpy(),
        )
    return out


def _merge_split(graphs):
    """Block-diagonal merge of a split's graphs — same semantics as the
    reference's ``Batch.from_data_list`` (``vq_gnn_v2/utils/misc.py:133-137``):
    node ids offset per graph, features/labels concatenated."""
    eis, xs, ys = [], [], []
    offset = 0
    for ei, x, y in graphs:
        eis.append(ei + offset)
        xs.append(x)
        ys.append(y)
        offset += x.shape[0]
    return np.concatenate(eis, axis=1), np.concatenate(xs), np.concatenate(ys)


def convert_inductive(name: str, root: str):
    """ppi / cluster (``misc.py:158-177``): three independent multi-graph
    splits, each merged block-diagonally.  Archive keys: per split
    ``{train,val,test}_{edge_index,x,y}`` plus ``num_classes``."""
    import torch_geometric.datasets as D

    if name == "ppi":
        make = lambda split: D.PPI(root=root, split=split)
    elif name == "cluster":
        make = lambda split: D.GNNBenchmarkDataset(
            root=root, name="CLUSTER", split=split
        )
    else:
        raise ValueError(name)

    out = {}
    num_classes = 0
    for split in ("train", "val", "test"):
        ds = make(split)
        graphs = [
            (
                d.edge_index.numpy(),
                d.x.numpy().astype(np.float32),
                d.y.numpy(),
            )
            for d in ds
        ]
        ei, x, y = _merge_split(graphs)
        out[f"{split}_edge_index"] = ei
        out[f"{split}_x"] = x
        out[f"{split}_y"] = y.astype(np.float32 if y.ndim > 1 else np.int32)
        num_classes = max(
            num_classes, y.shape[1] if y.ndim > 1 else int(y.max()) + 1
        )
    out["num_classes"] = num_classes
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True)
    p.add_argument("--root", default="/tmp/ogb")
    p.add_argument("--out", required=True)
    a = p.parse_args()
    if a.dataset in ("arxiv", "products"):
        arrays = convert_node(a.dataset, a.root)
    elif a.dataset in ("flickr", "yelp", "reddit"):
        arrays = convert_pyg(a.dataset, a.root)
    elif a.dataset in ("collab", "citation2"):
        arrays = convert_link(a.dataset, a.root)
    elif a.dataset in ("ppi", "cluster"):
        arrays = convert_inductive(a.dataset, a.root)
    else:
        raise ValueError(a.dataset)
    np.savez_compressed(a.out, **arrays)
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
