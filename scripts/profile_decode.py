"""One-shot profiling of the decode path on the real TPU (dev tool)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from jlm_tpu.config import Config
from jlm_tpu.data import build_vocab, Lexicon, generate_corpus, generate_test_set
from jlm_tpu.models.params import init_params
from jlm_tpu.decoder.engine import BeamDecoder
from jlm_tpu.decoder.lattice import build_lattice


def main():
    t_start = time.time()
    cfg = Config(vocab_size=50_000, embed_size=256, hidden_size=512,
                 beam_width=10, seed=0)
    vocab = build_vocab(generate_corpus(2000, seed=1234), cfg.vocab_size)
    lex = Lexicon.from_vocab(vocab)
    params = init_params(cfg)
    dec = BeamDecoder(params, lex, vocab, cfg, precision="default")
    kanas = [k for k, _ in generate_test_set(50, seed=777)]

    t0 = time.time()
    _ = dec.decode_batch(kanas)
    print(f"compile+first decode_batch: {time.time()-t0:.1f}s "
          f"(since start {time.time()-t_start:.1f}s)", flush=True)

    t0 = time.time()
    lats = [build_lattice(k, lex, vocab, cfg) for k in kanas]
    print(f"lattice build x50: {(time.time()-t0)*1e3:.0f}ms", flush=True)

    t0 = time.time()
    stack = lambda name: jnp.asarray(np.stack([getattr(l, name) for l in lats]))
    a = (stack("node_word"), stack("node_start"), stack("node_mask"),
         stack("node_cand_idx"), stack("lookahead_words"),
         stack("lookahead_mask"), jnp.asarray([l.length for l in lats], jnp.int32))
    jax.block_until_ready(a)
    print(f"stack+upload: {(time.time()-t0)*1e3:.0f}ms", flush=True)

    for rep in range(3):
        t0 = time.time()
        out = dec._decode_vmapped(dec.params, *a)
        t1 = time.time()
        out_h = jax.tree.map(np.asarray, out)
        t2 = time.time()
        res = [
            dec.results_from_output(lats[i], jax.tree.map(lambda x: x[i], out_h), 1)
            for i in range(50)
        ]
        t3 = time.time()
        print(f"rep{rep}: dispatch {(t1-t0)*1e3:.0f}ms fetch {(t2-t1)*1e3:.0f}ms "
              f"backtrack {(t3-t2)*1e3:.0f}ms", flush=True)

    # end-to-end decode_batch as bench calls it
    for rep in range(3):
        t0 = time.time()
        _ = dec.decode_batch(kanas)
        print(f"decode_batch e2e: {(time.time()-t0)*1e3:.0f}ms", flush=True)


if __name__ == "__main__":
    main()
