"""Inject ML-20M user tags into an atomic ``.item`` file as a token_seq column.

Parity target: the reference fork's ``scripts/add_tag_feature_to_item.py``,
which matches ml-100k item titles against ML-20M ``movies.csv`` titles
(exact "<title> (<year>)" match first, trying year +/-1, then a prefix
regex fallback) and appends each matched movie's tags from ``tags.csv`` as
a ``tags:token_seq`` column. The reference reads its two roots from magic
path files (``movielense_dataset_path`` / ``recbole_dataset_path``); this
version takes them as CLI flags instead.

Usage:
    python scripts/add_tag_feature_to_item.py \
        --ml20m-dir /path/to/ml-20m \
        --item-file /path/to/ml-100k/ml-100k.originalitems \
        --out-file  /path/to/ml-100k/ml-100k.item
"""

import argparse
import csv
import re
import sys


def load_tags(tags_csv):
    """movie_id -> [tag, ...] from ml-20m tags.csv (userId,movieId,tag,ts)."""
    tags = {}
    with open(tags_csv, newline="") as fin:
        reader = csv.reader(fin)
        next(reader)
        for line in reader:
            tags.setdefault(line[1].strip(), []).append(line[2].strip())
    return tags


def load_title_index(movies_csv):
    """lowercased "title (year)" -> movie_id, also indexing the variant with
    any parenthesized alternate title stripped ("a (b) (1995)" -> "a (1995)"),
    mirroring the reference's second index entry."""
    index = {}
    with open(movies_csv, newline="") as fin:
        reader = csv.reader(fin)
        next(reader)
        for line in reader:
            title = line[1].strip().lower()
            index[title] = line[0].strip()
            alt = re.sub(r"^([^(]+)(\(.*\))? (\(\d\d\d\d\))$",
                         r"\g<1>\g<3>", title)
            index[alt] = line[0].strip()
    return index


def match_movie(title, year, index):
    """Return the ml-20m id for an item title/year, or None. Tries the exact
    "title (year)" key at year, year+1, year-1, then the reference's slow
    fallback: any indexed title matching ``title.*\\(year)``."""
    for y in (year, year + 1, year - 1):
        key = f"{title} ({y})"
        if key in index:
            return index[key]
    for y in (year, year + 1, year - 1):
        pat = re.compile(re.escape(title) + r".*\(" + str(y) + r"\)")
        for cand, mid in index.items():
            if pat.match(cand):
                return mid
    return None


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ml20m-dir", required=True,
                    help="directory holding ml-20m movies.csv + tags.csv")
    ap.add_argument("--item-file", required=True,
                    help="source atomic item file (movie_title/release_year "
                         "in columns 1/2 after item_id)")
    ap.add_argument("--out-file", required=True,
                    help="destination .item file with the tags column added")
    args = ap.parse_args(argv)

    tags = load_tags(f"{args.ml20m_dir}/tags.csv")
    index = load_title_index(f"{args.ml20m_dir}/movies.csv")

    with open(args.item_file, newline="") as fin:
        reader = csv.reader(fin, delimiter="\t")
        header = next(reader)
        items = list(reader)

    n_tagged = n_skipped = 0
    with open(args.out_file, "w", newline="") as fout:
        writer = csv.writer(fout, delimiter="\t")
        writer.writerow(header + ["tags:token_seq"])
        for item in items:
            title = re.sub(r"^([^(]+)( \(.*\))?$", r"\g<1>",
                           item[1].strip().lower())
            year_tok = item[2].strip()
            if not year_tok or not year_tok.lstrip("-").isdigit():
                # the reference drops rows with unparseable years
                n_skipped += 1
                print(f"skipping (bad year): {item}", file=sys.stderr)
                continue
            mid = match_movie(title, int(year_tok), index)
            if mid is not None and mid in tags:
                item = item + [" ".join(tags[mid])]
                n_tagged += 1
            writer.writerow(item)
    print(f"tagged {n_tagged}/{len(items)} items "
          f"({n_skipped} skipped)", file=sys.stderr)


if __name__ == "__main__":
    main()
