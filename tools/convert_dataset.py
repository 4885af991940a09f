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
    else:
        raise ValueError(a.dataset)
    np.savez_compressed(a.out, **arrays)
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
