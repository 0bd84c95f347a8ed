"""HairFast public API: the `swap()` interface of the reference, TPU-backed.

Mirrors reference hair_swap.py:27-133 (class HairFast + get_parser) with the
same call signature; the execution model differs by design: each dedup case
compiles ONCE into a device-resident XLA program, then every subsequent swap
of that case is a single dispatch (no eager op stream, no host round-trips
between stages).
"""

from __future__ import annotations

import argparse
from functools import partial
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hairfastgan_tpu.config import HairFastConfig
from hairfastgan_tpu.pipeline.swap import hair_fast, swap_cases
from hairfastgan_tpu.utils.images import (equal_replacer, save_image01,
                                          to_image_array, to_image_u8)
from hairfastgan_tpu.utils.timing import BenchSession
from hairfastgan_tpu.zoo import cast_zoo, init_zoo, load_zoo


class HairFast:
    """Hairstyle transfer interface (reference hair_swap.py:27-105).

    Parameters come from a converted checkpoint directory when available;
    otherwise a random-weight zoo is built (shape-correct, for smoke tests
    and benchmarking without the pretrained files).
    """

    def __init__(self, cfg: HairFastConfig = HairFastConfig(), zoo: Optional[Dict] = None):
        self.cfg = cfg
        if cfg.compile_cache_dir:
            # the fused swap program compiles in minutes; the persistent
            # cache roughly halves later process starts (tracing and
            # sub-5s compiles are not cached)
            try:
                jax.config.update("jax_compilation_cache_dir",
                                  cfg.compile_cache_dir)
                jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
            except Exception:
                pass  # older jax without the persistent cache
        if zoo is not None:
            self.zoo = zoo
        elif Path(cfg.checkpoint_dir).exists():
            self.zoo = load_zoo(cfg.checkpoint_dir, cfg)
        else:
            self.zoo = init_zoo(jax.random.PRNGKey(0), cfg)
        if cfg.compute_dtype == "bfloat16":
            # weights-resident compute dtype: halves per-swap weight reads
            # and removes the per-call f32->bf16 convert ops (zoo.cast_zoo)
            self.zoo = cast_zoo(self.zoo)
        # NOTE: zoo.pack_zoo (consolidated head/conv layouts) is measured
        # SLOWER on v5e — the unpacked layout is the fast default.
        self.zoo = jax.device_put(self.zoo)
        self._jitted: Dict[str, callable] = {}
        self.bench = BenchSession("swap")

    def _fn(self, case: str, debug: bool = False, u8: bool = False,
            out_res: Optional[int] = None):
        """u8=True quantizes the final image INSIDE the program (uint8 out
        of the same dispatch: no second round-trip through the link, 4x
        less device->host transfer). out_res < generator size additionally
        bicubic-downsamples the final image inside the same program (the
        response-side serving lever: 512^2 uint8 ships 16x fewer bytes than
        1024^2 f32)."""
        size = self.cfg.stylegan.size
        out_res = size if not out_res or out_res >= size else out_res
        if size % out_res != 0:
            # callers go through _output_res, which snaps to a power-of-two
            # divisor; a raw out_res must honor the same contract (the fused
            # downsample is an integer-factor bicubic FIR)
            raise ValueError(f"out_res {out_res} must divide size {size}")
        key = (case, debug, u8, out_res)
        if key not in self._jitted:
            cfg = self.cfg

            @partial(jax.jit, static_argnames=())
            def fn(zoo, face, shape, color, noise_key):
                out = hair_fast(zoo, face, shape, color, case=case, cfg=cfg,
                                dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                                else jnp.float32,
                                noise_key=noise_key,
                                return_intermediate=debug)
                final = out[0] if debug else out
                probe = jnp.sum(final[:, 0, 0, 0])  # scalar sync probe
                if not debug and out_res and out_res != size:
                    from hairfastgan_tpu.ops.resample import bicubic_downsample

                    out = bicubic_downsample(out, size // out_res)
                if u8 and not debug:
                    out = jnp.clip(out * 255.0 + 0.5, 0.0,
                                   255.0).astype(jnp.uint8)
                return out, probe

            self._jitted[key] = fn
        return self._jitted[key]

    def _poisson_fn(self, out_res: Optional[int] = None):
        """Jitted final composite (reference utils/image_utils.py:58-94).
        The optional output downsample runs AFTER the composite (the solve
        needs full-resolution face pixels)."""
        key = ("poisson", out_res)
        if key not in self._jitted:
            from hairfastgan_tpu.pipeline.composite import poisson_composite

            size = self.cfg.stylegan.size

            @jax.jit
            def pfn(zoo, final, face_u8):
                face01 = face_u8.astype(jnp.float32) / 255.0
                out = poisson_composite(zoo, final.astype(jnp.float32), face01)
                probe = jnp.sum(out[:, 0, 0, 0])
                if out_res and out_res != size:
                    from hairfastgan_tpu.ops.resample import bicubic_downsample

                    out = bicubic_downsample(out, size // out_res)
                return out, probe

            self._jitted[key] = pfn
        return self._jitted[key]

    def _u8_fn(self):
        """Jitted [0,1]-float -> uint8 quantizer; fetching uint8 moves 4x
        fewer bytes device->host (the tunnel transfer dominates serving
        latency: measured ~530 ms/swap host-observed at f32 vs ~120 ms
        compute+RTT)."""
        if "u8" not in self._jitted:
            self._jitted["u8"] = jax.jit(lambda x: jnp.clip(
                x * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8))
        return self._jitted["u8"]

    def warmup(self, cases=("distinct",), batch_sizes=(1,),
               output: str = "float32", upload_res: Optional[int] = None,
               output_res: Optional[int] = None):
        """Compile the swap program(s) ahead of the first request.

        Serving cold-start: the fused 1024^2 program compiles in minutes
        cold, ~seconds-to-tens with a warm cfg.compile_cache_dir — doing it
        at process start instead of on the first user request. Warms the
        uint8-input programs `swap`/`swap_stream` dispatch (swap_batch's
        float-input programs compile separately); pass output="uint8" to
        warm the quantized-output variant the CLI serves, and upload_res
        to warm the reduced-upload program shape `swap(upload_res=...)`
        dispatches.
        """
        key = jax.random.PRNGKey(self.cfg.seed)
        size = self._upload_res(upload_res)
        ores = self._output_res(output_res)
        for b in batch_sizes:
            z = jnp.zeros((b, size, size, 3), jnp.uint8)
            for case in cases:
                _, probe = self._fn(case, u8=(output == "uint8"),
                                    out_res=ores)(self.zoo, z, z, z, key)
                probe.block_until_ready()
        return self

    def _upload_res(self, upload_res: Optional[int]) -> int:
        """Clamp the requested upload resolution to [floor, size].

        On full-size configs the floor is 512: BiSeNet parses faces in a
        FIXED 512^2 space (pipeline/embedding.to_res), so uploads below it
        would be silently upsampled into the parser and degrade hair
        masks. Sub-512 generator configs (tiny test zoos) keep the plain
        [.., size] clamp.
        """
        size = self.cfg.stylegan.size
        if upload_res is None:
            return size
        floor = 512 if size > 512 else 1
        return max(floor, min(upload_res, size))

    def _output_res(self, output_res: Optional[int]) -> int:
        """Snap the requested response resolution to a power-of-two divisor
        of the generator size (the fused output downsample is an integer-
        factor bicubic FIR), rounding UP so callers never get less than
        they asked for."""
        size = self.cfg.stylegan.size
        if output_res is None or output_res >= size:
            return size
        if output_res < 1:
            raise ValueError(f"output_res must be >= 1, got {output_res}")
        f = size // output_res                   # integer shrink factor
        f = 1 << (f.bit_length() - 1)            # floor to power of two
        return size // f

    def swap(self, face_img, shape_img, color_img, benchmark: bool = False,
             align: bool = False, seed: Optional[int] = None,
             exp_name: Optional[str] = None,
             poisson: bool = False, output: str = "float32",
             upload_res: Optional[int] = None,
             output_res: Optional[int] = None) -> np.ndarray:
        """face/shape/color (path | PIL | ndarray | tensor-like) -> [1024,1024,3]
        float image in [0,1] (output="float32", reference-compatible) or
        uint8 in [0,255] (output="uint8", 4x less device->host transfer —
        the right choice when the result is saved to PNG anyway).

        upload_res=512 ships inputs at 512^2 (1/4 the host->device bytes;
        values below 512 are clamped — BiSeNet's parser space is a fixed
        512^2). The pipeline never consumes the raw photo above its fixed
        working spaces — BiSeNet parses at 512 and every encoder at 256
        (reference Embedding.py:56-118 downsamples exactly the same way) —
        so the change is WHERE the first 2x downsample runs AND WHICH
        filter performs it: with the native loader built, the host resize
        is the SAME Keys a=-0.75 bicubic as the device resampler (<=1 u8
        step apart, native/hf_loader.cpp hfl_resize_u8); the PIL fallback
        substitutes LANCZOS + uint8 re-quantization.
        scripts/upload_res_agreement.py measures the numerics cost. Output stays at the full generator
        resolution. Serving through a bandwidth-limited link is
        upload-bound, so this is the serving latency lever (see bench.py's
        serving metrics); leave None for byte-exact parity with the
        full-resolution coercion path.

        output_res=512 serves a 512^2 response: the final bicubic 2x
        downsample is fused INTO the swap program, so a 512^2-uint8
        response ships 16x fewer bytes than the 1024^2-f32 default — the
        response-side twin of upload_res for bandwidth-limited links
        (requests snap up to a power-of-two divisor of the generator
        size). The pipeline itself always computes at full resolution;
        only the response shrinks. Ignored under save_all debug dumps.

        poisson=True additionally seamless-clones the original face photo
        back into the result outside the (dilated) hair region — the
        reference's optional `poisson_image_blending` post-process, solved
        on-device instead of via the fpie subprocess."""
        size = self.cfg.stylegan.size
        up = self._upload_res(upload_res)
        if align:
            from hairfastgan_tpu.utils.face_align import align_faces
            from hairfastgan_tpu.utils.images import to_raw_image

            # align crops from the ORIGINAL pixels (no pre-resize); the
            # STAR on-device landmark path is used when the zoo carries
            # star weights, else dlib (reference recipe)
            imgs = align_faces([to_raw_image(im)
                                for im in (face_img, shape_img, color_img)],
                               output_size=size,
                               star_params=self.zoo.get("star"))
            imgs = [np.clip(im * 255.0 + 0.5, 0, 255).astype(np.uint8)
                    for im in imgs]
            face_full = imgs[0]  # aligned full-res face for poisson
            if up != size:
                imgs = [to_image_u8(im, up) for im in imgs]
        else:
            # ship uint8; the device normalizes (4x less host->device
            # traffic). Right-shaped uint8 input passes through copy-free.
            imgs = [to_image_u8(im, up)
                    for im in (face_img, shape_img, color_img)]
            face_full = None  # coerced on demand below
        imgs = equal_replacer(imgs)
        case = swap_cases(*imgs)

        face, shape, color = (jnp.asarray(im)[None] for im in imgs)
        key = jax.random.PRNGKey(self.cfg.seed if seed is None else seed)
        debug = self.cfg.save_all and exp_name is not None
        # quantize inside the program when the caller wants uint8 and no
        # float post-pass (poisson/debug) needs the float image — the whole
        # request is then ONE dispatch and a 4x-smaller down-transfer
        u8_fused = output == "uint8" and not debug and not poisson
        ores = self._output_res(output_res)
        # poisson composites at full resolution; its wrapper applies the
        # output downsample after the solve
        fn = self._fn(case, debug=debug, u8=u8_fused,
                      out_res=size if poisson else ores)

        if benchmark:
            self.bench.start()
        out, probe = fn(self.zoo, face, shape, color, key)
        final, inter = out if debug else (out, None)
        if poisson:
            # the composite clones ORIGINAL face pixels at the output
            # resolution; under upload_res the swap inputs are smaller, so
            # the full-res face ships separately for this one pass
            if up != size:
                pface = jnp.asarray(
                    face_full if face_full is not None
                    else to_image_u8(face_img, size))[None]
            else:
                pface = face
            final, probe = self._poisson_fn(out_res=ores)(self.zoo, final, pface)
        if benchmark:
            self.bench.lap(np.asarray(probe))

        if debug:
            self._dump_intermediates(exp_name, np.asarray(final[0]), inter)
        if u8_fused:
            return np.asarray(final[0])
        if output == "uint8":
            return np.asarray(self._u8_fn()(final[0]))
        return np.asarray(final[0], dtype=np.float32)

    def _dump_intermediates(self, exp_name: str, final: np.ndarray, inter: Dict):
        """save_all artifact dumps (reference utils/save_utils.py usage)."""
        from hairfastgan_tpu.utils.save_utils import (
            save_gen_image, save_latents, save_vis_mask)

        out = Path(self.cfg.save_all_dir) / exp_name
        save_image01(out / "Final" / "final.png", final)
        save_gen_image(out, "Blending", "blending.png", inter["I_blend"])
        for name in ("mask_face", "mask_shape", "mask_color"):
            save_vis_mask(out, "Shape", f"{name}.png", inter[name])
        save_latents(out, "FS", "face.npz", latent_S=inter["S_face"],
                     latent_F=inter["F_face"], latent_W=inter["W_face"])
        save_latents(out, "Align", "align.npz",
                     latent_F_align=inter["latent_F_align"])
        save_latents(out, "Blending", "blending.npz", S_blend=inter["S_blend"])
        save_latents(out, "Final", "final.npz", S_final=inter["S_final"],
                     F_final=inter["F_final"])

    __call__ = swap

    def swap_batch(self, faces, shapes, colors, case: str = "distinct",
                   output: str = "float32") -> np.ndarray:
        """Batched triples [B,H,W,3] -> [B,H,W,3]; the TPU throughput path.

        On a multi-chip host the batch is shard_map'd over a 1-D data mesh:
        each chip runs the plain B/n-transfer program with ZERO collectives
        (triples are independent — see parallel.mesh.data_parallel for why
        shard_map instead of partitioner propagation), so each row of the
        result is bit-identical to a B=1 `swap` of that triple. output=
        "uint8" quantizes on device (4x less device->host transfer).

        On one chip, batches beyond cfg.max_batch_per_dispatch are split
        into sequential dispatches of that size (per-chunk noise keys):
        B=16 in one program is MEASURED SLOWER than 2x B=8 on v5e (HBM
        pressure — see the config knob).
        """
        u8 = output == "uint8"
        fn = self._fn(case, u8=u8)  # u8: quantized inside the program
        n_dev = len(jax.devices())
        b = np.shape(faces)[0]
        chunk = self.cfg.max_batch_per_dispatch
        key = jax.random.PRNGKey(self.cfg.seed)
        if n_dev > 1 and b % n_dev == 0:
            from hairfastgan_tpu.parallel import data_parallel, make_mesh

            args = (jnp.asarray(faces), jnp.asarray(shapes),
                    jnp.asarray(colors))
            dp_key = ("dp", case, n_dev, u8)
            if dp_key not in self._jitted:
                plan = make_mesh(n_data=n_dev)
                self._jitted[dp_key] = data_parallel(
                    plan, lambda z, f, s, c, k: fn(z, f, s, c, k)[0],
                    in_batched=(False, True, True, True, False))
            out = self._jitted[dp_key](self.zoo, *args, key)
        elif chunk and b > chunk:
            # per-chunk host->device transfer, not one bulk asarray: JAX
            # dispatch is async, so chunk k+1's upload overlaps chunk k's
            # compute and nothing blocks until the final concatenate is
            # fetched (VERDICT r3 #9 — the old bulk transfer serialized
            # the whole upload ahead of the first dispatch)
            outs = []
            for i in range(0, b, chunk):
                part = tuple(jnp.asarray(a[i:i + chunk])
                             for a in (faces, shapes, colors))
                outs.append(fn(self.zoo, *part,
                               jax.random.fold_in(key, i))[0])
            out = jnp.concatenate(outs)
        else:
            args = (jnp.asarray(faces), jnp.asarray(shapes),
                    jnp.asarray(colors))
            out, _ = fn(self.zoo, *args, key)
        if u8:
            return np.asarray(out)
        return np.asarray(out, dtype=np.float32)


    def swap_stream(self, triples, case: str = "distinct", depth: int = 3,
                    output: str = "float32", batch: int = 1,
                    upload_res: Optional[int] = None,
                    output_res: Optional[int] = None):
        """Serving path: iterate (index, final_image) over many triples,
        overlapping host decode (native C++ loader) with device compute.

        `triples`: sequence of (face_path, shape_path, color_path). JAX
        dispatch is async — up to `depth` dispatches stay in flight on the
        chip while further triples decode on host threads; the host only
        blocks fetching the OLDEST in-flight result once the pipeline is
        full.

        `batch` > 1 micro-batches: consecutive decoded triples are grouped
        into one [batch, ...] dispatch (B=8 is the measured v5e throughput
        sweet spot — see swap_batch). The final partial group is padded by
        repeating its last triple so ONE compiled shape serves the whole
        stream; latency per result rises toward the batched program's
        runtime, throughput approaches swap_batch's. NOTE: through the
        tunneled single-chip dev setup the stream measures ~3.5 triples/s
        at EITHER batch size — host->device upload (3x ~1 MB jpeg/triple)
        is the wall there, not compute; the batching win appears on
        directly-attached TPUs where swap_batch(B=8) is ~50% faster than
        B=1.

        `upload_res` (e.g. 512): the native C++ loader decodes + bicubic-
        resizes straight to the reduced resolution, cutting the per-triple
        upload 4x — the stream's measured wall on tunneled setups (see
        `swap`'s upload_res note for the numerics contract).

        Decode failures never kill the stream: a triple whose face/shape/
        color fails to decode yields `(index, None)` (with a warning naming
        the bad files) and the remaining triples proceed — matching the
        reference's drop-bad-rows-and-continue data paths
        (scripts/blending_train.py:181-217). Callers should treat a None
        image as a per-item error marker.
        """
        from hairfastgan_tpu.data.native_loader import (
            NativeImageLoader, native_available)
        from hairfastgan_tpu.utils.images import to_image_u8

        up = self._upload_res(upload_res)
        fn = self._fn(case, u8=(output == "uint8"),
                      out_res=self._output_res(output_res))
        key = jax.random.PRNGKey(self.cfg.seed)

        # uint8 end-to-end: the loader prefetches raw u8 pixels and the
        # swap program normalizes on device — 4x less host->device traffic
        # and the same compiled program as the single-swap path.
        paths = [p for t in triples for p in t]
        if native_available():
            loader = NativeImageLoader([str(p) for p in paths],
                                       out_size=up, threads=4,
                                       dtype=np.uint8)
            images: Dict[int, np.ndarray] = {}
            got = iter(loader)
        else:
            # PIL fallback: failed decodes are simply absent from `images`
            # (the native loader reports them the same way: a warning +
            # a missing index), unifying the skip logic below
            images = {}
            for i, p in enumerate(paths):
                try:
                    images[i] = to_image_u8(p, up)
                except Exception as e:
                    import warnings

                    warnings.warn(f"decode failed: {p} ({e})")
            got = iter(())

        pending = []  # (triple idxs, device result) — async in flight
        next_needed = 0
        n = len(triples)

        def ready(i):
            return all(3 * i + j in images for j in range(3))

        def launch(idxs):
            # pad a partial tail group by repeating its last triple: one
            # compiled [batch, ...] shape serves the whole stream
            pad = list(idxs) + [idxs[-1]] * (batch - len(idxs))
            face, shape, color = (
                jnp.asarray(np.stack([images[3 * i + j] for i in pad]))
                for j in range(3))
            for i in idxs:
                for j in range(3):
                    images.pop(3 * i + j)
            out, _ = fn(self.zoo, face, shape, color, key)
            final = out[0] if isinstance(out, tuple) else out
            pending.append((idxs, final))

        drained = False
        while next_needed < n or pending:
            # fill the device pipeline: launch while slots are free,
            # consuming decode results as they arrive
            while next_needed < n and len(pending) < depth:
                group = list(range(next_needed,
                                   min(next_needed + batch, n)))
                if all(ready(i) for i in group):
                    launch(group)
                    next_needed = group[-1] + 1
                elif not drained:
                    try:
                        idx, img = next(got)
                        images[idx] = img
                    except StopIteration:
                        drained = True
                else:
                    # decode failure(s) in this group (the loader drained
                    # without delivering all three images): skip the bad
                    # triples — error markers ride the pending FIFO so
                    # results keep arriving in launch order — and batch
                    # the surviving members (launch pads partial groups)
                    import warnings

                    good = [i for i in group if ready(i)]
                    bad = [i for i in group if not ready(i)]
                    for i in bad:
                        missing = [paths[3 * i + j] for j in range(3)
                                   if 3 * i + j not in images]
                        warnings.warn(f"skipping triple {i}: decode failed "
                                      f"for {missing}")
                        for j in range(3):  # drop partial decodes
                            images.pop(3 * i + j, None)
                    pending.append((bad, None))
                    if good:
                        launch(good)
                    next_needed = group[-1] + 1
            if pending:
                idxs, dev = pending.pop(0)
                if dev is None:  # error markers for skipped triples
                    for i in idxs:
                        yield i, None
                    continue
                host = np.asarray(dev)
                for j, i in enumerate(idxs):
                    arr = host[j]
                    yield i, (arr if output == "uint8"
                              else arr.astype(np.float32, copy=False))


def get_parser() -> argparse.ArgumentParser:
    """CLI flags mirroring reference hair_swap.get_parser (hair_swap.py:108-133)."""
    p = argparse.ArgumentParser(description="HairFast-TPU")
    p.add_argument("--save_all_dir", type=Path, default=Path("output"))
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--ckpt_dir", type=str, default="pretrained_models_jax",
                   help="directory of converted checkpoints (see zoo.load_zoo)")
    p.add_argument("--channel_multiplier", type=int, default=2)
    p.add_argument("--latent", type=int, default=512)
    p.add_argument("--n_mlp", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=3)
    p.add_argument("--save_all", action="store_true")
    p.add_argument("--mixing", type=float, default=0.95)
    p.add_argument("--smooth", type=int, default=5)
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=("bfloat16", "float32"))
    p.add_argument("--compile_cache_dir", type=str,
                   default="/tmp/hairfast_jax_cache",
                   help="persistent XLA compile cache ('' disables)")
    return p


def config_from_args(args: argparse.Namespace) -> HairFastConfig:
    from hairfastgan_tpu.config import StyleGANConfig

    return HairFastConfig(
        stylegan=StyleGANConfig(size=args.size,
                                channel_multiplier=args.channel_multiplier,
                                style_dim=args.latent, n_mlp=args.n_mlp),
        batch_size=args.batch_size,
        mixing=args.mixing,
        smooth=args.smooth,
        save_all=args.save_all,
        save_all_dir=args.save_all_dir,
        checkpoint_dir=Path(args.ckpt_dir),
        compute_dtype=args.compute_dtype,
        compile_cache_dir=(getattr(args, "compile_cache_dir",
                                   "/tmp/hairfast_jax_cache") or None),
    )
