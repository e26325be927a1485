"""Deterministic synthetic atomic-file datasets for tests.

Plays the role of the reference's bundled tests/test_data fixtures (SURVEY.md §4)
without copying them: a small user-item interaction set with ratings and
timestamps, user/item side features, and a toy knowledge graph, generated from
a fixed seed with a planted popularity structure so ranking models have signal.
"""

import os

import numpy as np


def make_synthetic_dataset(root, name="synth", n_users=60, n_items=80,
                           n_inter=2400, seed=7, with_kg=True):
    rng = np.random.RandomState(seed)
    ds_dir = os.path.join(root, name)
    os.makedirs(ds_dir, exist_ok=True)

    # planted structure: item popularity is zipf-ish; each user has a latent
    # taste cluster that biases which third of items they hit
    item_pop = 1.0 / np.arange(1, n_items + 1) ** 0.8
    rows = []
    seen = set()
    t = 1_000_000
    while len(rows) < n_inter:
        u = rng.randint(1, n_users + 1)
        cluster = u % 3
        p = item_pop.copy()
        lo, hi = cluster * n_items // 3, (cluster + 1) * n_items // 3
        p[lo:hi] *= 4.0
        p /= p.sum()
        i = rng.choice(n_items, p=p) + 1
        if (u, i) in seen:
            continue
        seen.add((u, i))
        rating = rng.randint(1, 6)
        t += rng.randint(1, 50)
        rows.append((u, i, rating, t))

    with open(os.path.join(ds_dir, f"{name}.inter"), "w") as fh:
        fh.write("user_id:token\titem_id:token\trating:float\ttimestamp:float\n")
        for u, i, r, ts in rows:
            fh.write(f"u{u}\ti{i}\t{r}\t{ts}\n")

    with open(os.path.join(ds_dir, f"{name}.user"), "w") as fh:
        fh.write("user_id:token\tage:float\tgender:token\tinterests:token_seq\n")
        words = ["sports", "music", "travel", "books", "games", "cooking"]
        for u in range(1, n_users + 1):
            iw = " ".join(words[(u + j) % 6] for j in range(1 + u % 3))
            fh.write(f"u{u}\t{18 + (u * 7) % 50}\t{'M' if u % 2 else 'F'}\t{iw}\n")

    with open(os.path.join(ds_dir, f"{name}.item"), "w") as fh:
        fh.write("item_id:token\tgenre:token_seq\tprice:float\n")
        genres = ["action", "comedy", "drama", "scifi", "doc"]
        for i in range(1, n_items + 1):
            gs = " ".join(genres[(i + j) % 5] for j in range(1 + i % 3))
            fh.write(f"i{i}\t{gs}\t{round(1.0 + (i % 10) * 0.5, 2)}\n")

    if with_kg:
        with open(os.path.join(ds_dir, f"{name}.kg"), "w") as fh:
            fh.write("head_id:token\trelation_id:token\ttail_id:token\n")
            for i in range(1, n_items + 1):
                fh.write(f"e{i}\tr{(i % 4) + 1}\te{n_items + 1 + (i % 20)}\n")
        with open(os.path.join(ds_dir, f"{name}.link"), "w") as fh:
            fh.write("item_id:token\tentity_id:token\n")
            for i in range(1, n_items + 1):
                fh.write(f"i{i}\te{i}\n")

    return ds_dir
