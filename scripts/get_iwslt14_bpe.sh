#!/usr/bin/env bash
# Download IWSLT14 de-en and build BPE data (counterpart of
# scripts/get_iwslt14_bpe.sh). Produces data/iwslt14/{train,dev,test}.{de,en}
# + bpe32000.codes/vocab for configs/iwslt14_deen_bpe.yaml.
set -euo pipefail

DATA_DIR=${1:-data/iwslt14}
BPE_SIZE=${2:-32000}
URL="https://wit3.fbk.eu/archive/2014-01/texts/de/en/de-en.tgz"

mkdir -p "$DATA_DIR"
cd "$DATA_DIR"

if [ ! -f de-en.tgz ]; then
    echo "Downloading IWSLT14 de-en..."
    curl -fL -o de-en.tgz "$URL" || wget -O de-en.tgz "$URL"
fi
tar -xzf de-en.tgz

# strip xml markup from the training files, split dev/test sets
python - <<'PYEOF'
import re
from pathlib import Path

root = Path("de-en")
for lang in ["de", "en"]:
    lines = []
    for line in (root / f"train.tags.de-en.{lang}").read_text(encoding="utf-8").splitlines():
        if line.strip().startswith("<"):
            continue
        lines.append(line.strip().lower())
    Path(f"train.{lang}").write_text("\n".join(lines) + "\n", encoding="utf-8")

    dev, test = [], []
    for xml in sorted(root.glob(f"IWSLT14.TED*.de-en.{lang}.xml")):
        segs = re.findall(r"<seg[^>]*>(.*?)</seg>", xml.read_text(encoding="utf-8"))
        segs = [s.strip().lower() for s in segs]
        if "dev2010" in xml.name or "dev2012" in xml.name:
            dev.extend(segs)
        else:
            test.extend(segs)
    Path(f"dev.{lang}").write_text("\n".join(dev) + "\n", encoding="utf-8")
    Path(f"test.{lang}").write_text("\n".join(test) + "\n", encoding="utf-8")
print("train/dev/test extracted")
PYEOF

# learn joint BPE with the first-party implementation
python - <<PYEOF
import sys
sys.path.insert(0, "$OLDPWD")
from collections import Counter
from pathlib import Path
from joeys2t_tpu.bpe import BPE, learn_bpe, write_codes

freqs = Counter()
for lang in ["de", "en"]:
    for line in Path(f"train.{lang}").read_text(encoding="utf-8").splitlines():
        freqs.update(line.split())
merges = learn_bpe(dict(freqs), $BPE_SIZE)
write_codes(merges, Path("bpe32000.codes"))

bpe = BPE.from_file(Path("bpe32000.codes"))
pieces = Counter()
for tok, c in freqs.items():
    for p in bpe.segment_word(tok):
        pieces[p] += c
vocab = ["<unk>", "<pad>", "<s>", "</s>"] + [p for p, _ in pieces.most_common()]
Path("bpe32000.vocab").write_text("\n".join(vocab) + "\n", encoding="utf-8")
print(f"BPE codes + vocab ({len(vocab)}) written")
PYEOF

echo "Done: $DATA_DIR"
