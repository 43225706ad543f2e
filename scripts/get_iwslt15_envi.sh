#!/usr/bin/env bash
# Download IWSLT15 English-Vietnamese (Stanford NMT distribution), the
# counterpart of scripts/get_iwslt15_envi.sh. Produces plain-text parallel
# files usable with dataset_type: "plain".
set -euo pipefail

DATA_DIR=${1:-data/iwslt15_envi}
BASE="https://nlp.stanford.edu/projects/nmt/data/iwslt15.en-vi"

mkdir -p "$DATA_DIR"
cd "$DATA_DIR"

for f in train.en train.vi tst2012.en tst2012.vi tst2013.en tst2013.vi \
         vocab.en vocab.vi; do
    if [ ! -f "$f" ]; then
        echo "Downloading $f..."
        curl -fL -o "$f" "$BASE/$f" || wget -O "$f" "$BASE/$f"
    fi
done

# joey naming: train/dev/test.{src-lang}
ln -sf train.en train.en.txt 2>/dev/null || true
cp train.en train.en.plain 2>/dev/null || true
ln -sf tst2012.en dev.en; ln -sf tst2012.vi dev.vi
ln -sf tst2013.en test.en; ln -sf tst2013.vi test.vi
echo "Done: $DATA_DIR (train/dev/test .en/.vi)"
