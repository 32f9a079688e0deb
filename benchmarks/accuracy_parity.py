"""Proxy accuracy-parity experiment: independent torch model vs buckgnn_tpu.

Trains the reference architecture (GraphSage_addAggr_Shared, mean pool —
Models/BuckGNN.py:311-352) re-implemented INDEPENDENTLY in plain torch, and
this framework, on the SAME synthetic dataset, split and hyperparameters,
then compares final validation MAPE. Real Nastran data is unavailable in
this environment, so matching learning quality on the shared synthetic
oracle is the strongest accuracy-parity evidence available (VERDICT r1 #6).

Both sides: relative-error loss on denormalized eigenvalues
(TRAIN_FINAL.py:262), Adam + cosine decay to lr/100, same batch size and
epoch count; inits and shuffles differ (that is the run-to-run noise the
comparison is made within).

Usage: python benchmarks/accuracy_parity.py [--graphs 500] [--epochs 150]
Writes the table into stdout; RESULTS.md records the committed run.
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# --------------------------------------------------------------------- #
# independent torch side
# --------------------------------------------------------------------- #


def build_torch_model(n_feat, hidden, torch):
    """Encoder -> shared SAGEConv(add, normalize) stack -> mean pool ->
    decoder, per Models/BuckGNN.py:311-352 (independent re-implementation,
    same math as tests/test_torch_parity.py)."""
    nn = torch.nn

    class SharedSage(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc = nn.Sequential(
                nn.Linear(n_feat, 64), nn.ReLU(), nn.Linear(64, hidden)
            )
            self.lin_l = nn.Linear(hidden, hidden)
            self.lin_r = nn.Linear(hidden, hidden, bias=False)
            self.dec = nn.Sequential(
                nn.Linear(hidden, 64), nn.ReLU(), nn.Linear(64, 1)
            )

        def forward(self, x, senders, receivers, graph_ids, n_graphs, L=3):
            x = self.enc(x)
            for i in range(L):
                x_prev = x
                agg = torch.zeros_like(x)
                agg.index_add_(0, receivers, x[senders])
                out = self.lin_l(agg) + self.lin_r(x)
                x = out / out.norm(dim=-1, keepdim=True).clamp_min(1e-12)
                x = torch.relu(x)
                if 0 < i < L - 1:
                    x = x + x_prev
            pooled = torch.zeros(n_graphs, x.shape[1])
            pooled.index_add_(0, graph_ids, x)
            cnt = torch.zeros(n_graphs)
            cnt.index_add_(0, graph_ids, torch.ones_like(graph_ids,
                                                         dtype=torch.float32))
            pooled = pooled / cnt.clamp_min(1.0)[:, None]
            return self.dec(pooled).reshape(-1)

    return SharedSage()


def torch_batches(graphs, batch_size, rng, torch):
    """Block-diagonal concatenation, reshuffled per epoch."""
    order = rng.permutation(len(graphs))
    for lo in range(0, len(order), batch_size):
        idx = order[lo:lo + batch_size]
        xs, ss, rs, gs, ys = [], [], [], [], []
        off = 0
        for j, gi in enumerate(idx):
            g = graphs[gi]
            xs.append(np.asarray(g.x))
            ss.append(np.asarray(g.senders) + off)
            rs.append(np.asarray(g.receivers) + off)
            gs.append(np.full(g.n_node, j))
            ys.append(float(np.reshape(g.y, (-1,))[0]))
            off += g.n_node
        yield (
            torch.tensor(np.concatenate(xs), dtype=torch.float32),
            torch.tensor(np.concatenate(ss), dtype=torch.long),
            torch.tensor(np.concatenate(rs), dtype=torch.long),
            torch.tensor(np.concatenate(gs), dtype=torch.long),
            torch.tensor(np.array(ys), dtype=torch.float32),
            len(idx),
        )


def train_torch(train_data, val_data, nz, hidden, epochs, batch_size, lr,
                seed):
    import torch

    torch.manual_seed(seed)
    scale = float(np.reshape(nz.eigenvalue_scaler.scale_, (-1,))[0])
    center = float(np.reshape(nz.eigenvalue_scaler.center_, (-1,))[0])
    model = build_torch_model(train_data[0].x.shape[1], hidden, torch)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=epochs, eta_min=lr / 100.0
    )
    rng = np.random.default_rng(seed)

    def denorm(v):
        return v * scale + center

    best = math.inf
    for epoch in range(epochs):
        model.train()
        for x, s, r, g, y, ng in torch_batches(train_data, batch_size, rng,
                                               torch):
            pred = model(x, s, r, g, ng)
            dp, dy = denorm(pred), denorm(y)
            loss = (torch.abs(dp - dy) / (torch.abs(dy) + 1e-8)).mean()
            opt.zero_grad()
            loss.backward()
            opt.step()
        sched.step()
        model.eval()
        with torch.no_grad():
            errs = []
            for x, s, r, g, y, ng in torch_batches(val_data, batch_size,
                                                   np.random.default_rng(0),
                                                   torch):
                dp = denorm(model(x, s, r, g, ng))
                dy = denorm(y)
                errs.append(
                    (torch.abs(dp - dy) / torch.abs(dy)).numpy() * 100.0
                )
            mape = float(np.mean(np.concatenate(errs)))
        best = min(best, mape)
    return best, mape


# --------------------------------------------------------------------- #


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs", type=int, default=500)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="/tmp/accuracy_parity")
    args = ap.parse_args()

    import jax

    if jax.default_backend() != "cpu":
        # torch runs CPU-only here; keep the comparison same-host
        jax.config.update("jax_platforms", "cpu")

    from buckgnn_tpu.config import TrainConfig
    from buckgnn_tpu.graph.normalizer import normalize_dataset
    from buckgnn_tpu.graph.synthetic import generate_dataset
    from buckgnn_tpu.train.trainer import train_gnn

    ds = generate_dataset(args.graphs, seed=3, min_side=5, max_side=9,
                          use_virtual_edges=True)
    normed, nz = normalize_dataset(ds)
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(normed))
    n_val = max(len(normed) // 5, 1)
    val = [normed[i] for i in order[:n_val]]
    train = [normed[i] for i in order[n_val:]]
    print(f"dataset: {len(train)} train / {len(val)} val graphs", flush=True)

    cfg = TrainConfig(
        hidden_channels=args.hidden, num_layers=3,
        batch_size=args.batch_size, lr=args.lr, num_epochs=args.epochs,
        dropout_rate=0.0, scheduler="cosine", model_name="GraphSage_addAggr_Shared",
        pooling_layer="mean", loss_function="relative_error",
        segment_impl="xla", seed=args.seed,
    )
    t0 = time.time()
    res = train_gnn(cfg, train, val, nz, args.out, trial_id="parity_jax",
                    verbose=False)
    t_jax = time.time() - t0
    print(f"buckgnn_tpu: best val MAPE {res.best_val_mape:.3f}% "
          f"({t_jax:.0f}s)", flush=True)

    t0 = time.time()
    best_t, last_t = train_torch(train, val, nz, args.hidden, args.epochs,
                                 args.batch_size, args.lr, args.seed)
    t_torch = time.time() - t0
    print(f"torch (independent): best val MAPE {best_t:.3f}% "
          f"(final {last_t:.3f}%, {t_torch:.0f}s)", flush=True)
    print(f"PARITY: jax={res.best_val_mape:.3f}% torch={best_t:.3f}% "
          f"ratio={res.best_val_mape / max(best_t, 1e-9):.2f}", flush=True)


if __name__ == "__main__":
    main()
