"""Training CLI.

TPU-native counterpart of scripts/python/train.py: same two-phase argument
parsing (core args first, then the chosen components inject their flags,
train.py:96-101), per-job frozen conf JSON (train.py:116-140), resume /
warm-start (train.py:185-243), fixed-size epochs with validation and
NaN-skipped checkpoints (train.py:277-317).

Additions over the reference:
  --strategy single|dp|replica_avg  on-mesh distribution (SURVEY.md §2.4)
  --tp N                            tensor-parallel axis for the Conformer
  --bf16                            bf16 model compute
  --synthetic-data                  built-in corpus (no manifests needed)
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import time as _time
from pathlib import Path

import jax
import numpy as np

from css_tpu.data import Corpus, SyntheticCorpus, build_dataset
from css_tpu.data.base import DATASETS
from css_tpu.data.corpus import synthetic_noise_pool, synthetic_rir_pool
from css_tpu.models import MODELS
from css_tpu.objectives import OBJECTIVES
from css_tpu.trainer import LRSchedule, Trainer, checkpoint
from css_tpu.utils.logging import MetricsLogger, get_logger

log = get_logger(__name__)


def parse_arguments(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--train-manifest", type=str, default=None)
    parser.add_argument("--dev-manifest", type=str, default=None)
    parser.add_argument("--synthetic-data", action="store_true",
                        help="use the built-in synthetic corpus")
    parser.add_argument("--synthetic-rirs", action="store_true",
                        help="augment with synthetic RIR/noise pools")
    parser.add_argument("--synthetic-speakers", type=int, default=8)
    parser.add_argument("--synthetic-utts", type=int, default=6)
    parser.add_argument("--synthetic-f0-max", type=float, default=None,
                        help="pack the synthetic speakers' fundamentals "
                             "into [90, f0_max] Hz (dense grid) instead of "
                             "the default 25 Hz ladder — better held-out-"
                             "speaker generalization")
    parser.add_argument("--synthetic-voice", default="harmonic",
                        choices=("harmonic", "formant"),
                        help="synthetic voice model: 'formant' gives each "
                             "speaker a persistent vocal-tract signature "
                             "(timbre cue beyond f0, like real talkers)")
    parser.add_argument("--spatialize-channels", type=int, default=0,
                        choices=(0, 7),
                        help="render training mixtures on the 7-mic "
                             "circular array (far-field delays, per-window "
                             "azimuths) and train the multichannel "
                             "IPD-featured model — the reference's 7ch "
                             "models were trained out-of-repo")
    parser.add_argument("--sensor-noise-level", type=float, default=0.003,
                        help="white sensor noise added per channel by "
                             "--spatialize-channels")
    parser.add_argument("--train-ipd-index", default="1,0;2,0;3,0;4,0;5,0;6,0",
                        help="IPD channel pairs for multichannel training "
                             "(config_7ch.yaml 'ipd' syntax)")
    parser.add_argument("--expdir", type=str, required=True)
    parser.add_argument("--model", default="Conformer",
                        choices=sorted(MODELS.keys()))
    parser.add_argument("--objective", default="MSE",
                        choices=sorted(OBJECTIVES.keys()))
    parser.add_argument("--dataset", default="css",
                        choices=sorted(DATASETS.keys()))
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--grad-thresh", type=float, default=30.0)
    parser.add_argument("--optim", default="sgd", choices=["sgd", "adam"])
    parser.add_argument("--lr", type=float, default=0.001)
    parser.add_argument("--weight-decay", type=float, default=1e-8)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--resume", default=None)
    parser.add_argument("--init", default=None)
    parser.add_argument("--replace-output", action="store_true",
                        help="with --init, re-initialize output layers "
                             "(the reference gates this on an undefined "
                             "flag, train.py:235)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--job", type=int, default=1)
    parser.add_argument("--num-epochs", type=int, default=10)
    parser.add_argument("--batches-per-epoch", type=int, default=500)
    parser.add_argument("--steps-per-dispatch", type=int, default=4,
                        help="train steps scanned inside one device program "
                             "(single strategy); amortizes per-dispatch "
                             "latency — the mixer holds each window bucket "
                             "for this many batches so groups stack. 1 = "
                             "one program per step (reference cadence)")
    parser.add_argument("--strategy", default="single",
                        choices=["single", "dp", "replica_avg"])
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel degree (dp strategy)")
    parser.add_argument("--num-replicas", type=int, default=None,
                        help="replica_avg strategy replica count")
    parser.add_argument("--nj-init", type=int, default=None,
                        help="replica_avg: ramp active replicas from "
                             "nj_init to num-replicas over the run "
                             "(train_parallel.sh:57 semantics)")
    parser.add_argument("--keep-every", type=int, default=20)
    parser.add_argument("--keep-last", type=int, default=2)
    parser.add_argument("--multihost", action="store_true",
                        help="initialize multi-process jax (auto-detected "
                             "topology on TPU pods; else pass --coordinator "
                             "--num-processes --process-id)")
    parser.add_argument("--coordinator", default=None,
                        help="host:port of process 0 (non-pod clusters)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--profile-dir", default=None,
                        help="capture a jax.profiler trace of epoch 1 here")
    parser.add_argument("--keep-best", action="store_true",
                        help="also save best.{job}.mdl whenever the "
                             "selection metric improves (held-out probe "
                             "SI-SNRi when --probe-sessions > 0, else "
                             "validation loss)")
    parser.add_argument("--probe-sessions", type=int, default=0,
                        help="run a per-epoch held-out SI-SNRi probe on "
                             "this many short fixed synthetic sessions "
                             "(full masking pipeline; checkpoint selection "
                             "tracks separation quality instead of val MSE "
                             "— BASELINE.md measured val-MSE selection "
                             "anti-correlated with held-out quality). "
                             "1ch STFT-mask models only")
    parser.add_argument("--probe-session-sec", type=float, default=12.0)
    parser.add_argument("--probe-stratify-f0", action="store_true",
                        help="pick probe session speaker pairs evenly "
                             "across the |f0| gap spectrum incl. the "
                             "closest pair (matches the 8-session "
                             "protocol's --stratify-f0; fixes the round-4 "
                             "probe/protocol rank inversions on close-f0 "
                             "material). Use with --probe-session-sec 30")
    parser.add_argument("--average-probe-top", type=int, default=0,
                        help="after training, average the parameters of "
                             "the N epochs with the highest held-out probe "
                             "SI-SNRi into avgtop.{job}.mdl and report its "
                             "probe score — the measured-winning selection "
                             "recipe (probe-select, then average probe-"
                             "adjacent checkpoints within one run's basin; "
                             "BASELINE.md avg23). Requires --probe-sessions")
    parser.add_argument("--probe-seed", type=int, default=456,
                        help="held-out probe corpus seed — disjoint from "
                             "all training seeds AND from the 8-session "
                             "eval protocol's seed-123 corpus (selecting "
                             "on the eval material would tune on the "
                             "test set)")
    parser.add_argument("--probe-speakers", type=int, default=6)
    parser.add_argument("--probe-utts", type=int, default=4)
    parser.add_argument("--validate-batches", type=int, default=100,
                        help="validation batches per epoch (iteration_types.py:71 uses 100)")
    parser.add_argument("--num-workers", type=int, default=2,
                        help="producer threads for mixture synthesis")
    parser.add_argument("--device-mix", action="store_true",
                        help="synthesize training mixtures ON the "
                             "accelerator: audio pools go to HBM once, the "
                             "host streams only sampling decisions "
                             "(~100 B/window), and windows/reverb/noise are "
                             "materialized inside the jitted train step — "
                             "removes the host->device audio transfer and "
                             "the host mixing bottleneck the reference "
                             "suffered (css README.md:13-14)")
    parser.add_argument("--platform", default=None,
                        help="pin the jax backend (e.g. cpu, tpu) — "
                             "overrides environment platform plugins")
    parser.add_argument("--prng-impl", default="rbg",
                        choices=["rbg", "threefry2x32"],
                        help="dropout PRNG; rbg is much faster on TPU")
    parser.add_argument("--debug-nans", action="store_true",
                        help="enable jax_debug_nans (fail fast at the op "
                             "that produced a non-finite value)")
    parser.add_argument("--fail-after-batches", type=int, default=None,
                        help="chaos-engineering hook: crash this process "
                             "abruptly (no checkpoint, exit 17) after N "
                             "batches — exercises the train_parallel "
                             "driver's failure detection")

    # two-phase parsing: component flags (train.py:96-101)
    args, leftover = parser.parse_known_args(argv)
    MODELS[args.model].add_args(parser)
    DATASETS[args.dataset].add_args(parser)
    add_obj = getattr(OBJECTIVES[args.objective], "add_args", None)
    if add_obj:
        add_obj(parser)
    LRSchedule.add_args(parser)
    parser.parse_args(argv, namespace=args)
    return args


def _pin_dev_windows(conf):
    """Validation conf: one fixed window bucket.

    Random validation window sizes would compile one eval program per
    bucket, re-paying tens of seconds at epoch boundaries until every
    bucket has been seen; a single mid-range bucket keeps val loss
    comparable across epochs AND compiles exactly once."""
    lo = float(conf.get("min_window_size", 2.0))
    hi = float(conf.get("max_window_size", 4.0))
    mid = (lo + hi) / 2
    return {**conf, "seed": 12345, "min_window_size": mid,
            "max_window_size": mid}


def build_corpus(args):
    if args.synthetic_data or not args.train_manifest:
        voice = getattr(args, "synthetic_voice", "harmonic")
        corpus = SyntheticCorpus(seed=args.seed,
                                 num_speakers=args.synthetic_speakers,
                                 utts_per_speaker=args.synthetic_utts,
                                 f0_max=args.synthetic_f0_max,
                                 voice=voice)
        dev = SyntheticCorpus(seed=args.seed + 1000, num_speakers=4,
                              utts_per_speaker=2, voice=voice)
    else:
        corpus = Corpus.from_manifest(args.train_manifest)
        dev = (Corpus.from_manifest(args.dev_manifest)
               if args.dev_manifest else None)
    return corpus, dev


def main(argv=None):
    from css_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = parse_arguments(argv)
    if args.platform:
        # before any backend use; env vars alone are not enough when a
        # sitecustomize platform plugin pins JAX_PLATFORMS at startup
        jax.config.update("jax_platforms", args.platform)
    expdir = Path(args.expdir)
    expdir.mkdir(parents=True, exist_ok=True)

    if args.multihost:
        from css_tpu.parallel.launch import initialize

        initialize(args.coordinator, args.num_processes, args.process_id)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    # multi-process: process 0 owns all filesystem writes (conf JSON,
    # checkpoints, metrics); other processes only feed their data shard
    # and participate in collectives
    is_lead = jax.process_index() == 0
    n_proc = jax.process_count()

    np.random.seed(args.seed)

    conf_path = expdir / f"conf.{args.job}.json"
    if args.resume is not None and conf_path.exists():
        conf = json.load(open(conf_path))
    else:
        conf = vars(args).copy()
        conf["epoch"] = 0
        if is_lead:
            json.dump(conf, open(conf_path, "w"), indent=4, default=str)

    corpus, dev_corpus = build_corpus(args)
    conf["seed"] = args.seed + 1000 * args.job
    if n_proc > 1:
        # per-process data feeding: disjoint mixture streams per process,
        # each synthesizing only its local share of the global batch
        conf["seed"] += 7919 * jax.process_index()
        if args.strategy in ("dp", "replica_avg"):
            if args.batch_size % n_proc:
                raise SystemExit(f"--batch-size {args.batch_size} must be "
                                 f"divisible by {n_proc} processes")
            conf["batch_size"] = args.batch_size // n_proc
            if args.num_workers > 1:
                log.warning("multi-process mesh strategies need lockstep "
                            "window buckets across processes; forcing "
                            "--num-workers 1 (prefetch threads interleave "
                            "nondeterministically)")
                args.num_workers = 1
    if args.synthetic_rirs:
        conf["rir_pool"] = synthetic_rir_pool()
        conf["noise_pool"] = synthetic_noise_pool()
    if args.spatialize_channels:
        if args.synthetic_rirs:
            raise SystemExit("--spatialize-channels is incompatible with "
                             "--synthetic-rirs (mono-mixture reverb has no "
                             "spatial image; sensor noise is added per "
                             "channel instead)")
        if args.device_mix and n_proc > 1:
            raise SystemExit("--spatialize-channels with --device-mix is "
                             "single-process for now")
        if args.model == "ConvTasNet":
            raise SystemExit("--spatialize-channels needs a mask model "
                             "(Conformer/BLSTM)")
    dmix = dev_dmix = None
    if args.device_mix:
        if n_proc > 1 and args.strategy == "single":
            raise SystemExit("--device-mix with multiple processes requires "
                             "--strategy dp or replica_avg")
        from css_tpu.data.device_mixer import DeviceMixer

        def _maybe_spatial(ds, seed):
            if not args.spatialize_channels:
                return ds
            from css_tpu.data.spatial import SpatialMixer

            return SpatialMixer(ds, noise_level=args.sensor_noise_level,
                                seed=seed)

        dmix = DeviceMixer(_maybe_spatial(
            build_dataset(args.dataset, corpus, conf), conf["seed"] + 31))
        # validation stays device-mixed only in the single strategy: mesh
        # strategies hold mesh-global state and the eval step would mix
        # committed placements with default-device pools
        if dev_corpus is not None and args.strategy == "single":
            dev_dmix = DeviceMixer(_maybe_spatial(build_dataset(
                args.dataset, dev_corpus, _pin_dev_windows(conf)), 12376))

    if (args.num_workers > 1
            or (n_proc > 1 and args.strategy in ("dp", "replica_avg"))):
        # producer threads AND cooperating processes must draw IDENTICAL
        # window-bucket sequences: the consumer-side regrouping (and, for
        # multi-process runs, the global-batch assembly) needs the
        # interleaved streams to agree on the bucket schedule. The offset
        # keeps this stream DISTINCT from every content seed (which use
        # +7919*pid / +7*worker): a window_seed equal to a content seed
        # would replay that rng's outputs for the bucket draws.
        if conf.get("window_seed") is None:
            conf["window_seed"] = args.seed + 1000 * args.job + 104729

    def make_train_stream(i=0):
        ds = build_dataset(args.dataset, corpus,
                           {**conf, "seed": conf["seed"] + 7 * i})
        if dmix:
            # spatial rendering (if any) happens in dmix.encode/materialize
            return dmix.wrap(ds)
        if args.spatialize_channels:
            from css_tpu.data.spatial import SpatialMixer

            return SpatialMixer(ds, noise_level=args.sensor_noise_level,
                                seed=conf["seed"] + 7 * i + 31)
        return ds

    if args.num_workers > 1:
        from css_tpu.data import PrefetchLoader

        dataset = PrefetchLoader(
            factory=make_train_stream,
            num_threads=args.num_workers,
            # stage batches on device ahead of the step (async transfer
            # overlaps with compute); dp/replica_avg shard on their own.
            # Recipe batches (device-mix) stay host-side: they are a few
            # hundred bytes and per-array device_put round-trips would cost
            # more than letting the step dispatch carry them inline
            device=(jax.devices()[0]
                    if args.strategy == "single" and not args.device_mix
                    else None),
            # emit same-shape runs so steps_per_dispatch stacking holds
            group=(args.steps_per_dispatch
                   if args.strategy == "single" else 1))
    else:
        dataset = make_train_stream()
    if dev_dmix is not None:
        dev_dataset = dev_dmix
    else:
        dev_dataset = (build_dataset(args.dataset, dev_corpus,
                                     _pin_dev_windows(conf))
                       if dev_corpus else None)
        if dev_dataset is not None and args.spatialize_channels:
            from css_tpu.data.spatial import SpatialMixer

            dev_dataset = SpatialMixer(
                dev_dataset, noise_level=args.sensor_noise_level, seed=12376)
    if args.fail_after_batches is not None:
        def _crashing(it, n=args.fail_after_batches):
            for i, b in enumerate(it):
                if i >= n:
                    os._exit(17)  # abrupt death mid-epoch, like SIGKILL
                yield b
        dataset = _crashing(iter(dataset))

    conf["bf16"] = args.bf16
    train_ipd = None
    if args.spatialize_channels:
        train_ipd = args.train_ipd_index
        n_pairs = len(train_ipd.split(";"))
        # [ch0 magnitude, M IPD pairs] — matches the 7ch Separator's
        # feature layout (ops/features.py FeatureExtractor)
        conf["idim"] = int(conf.get("num_bins", 257)) * (1 + n_pairs)
    model = MODELS[args.model].build_model(conf)
    objective = OBJECTIVES[args.objective].build_objective(conf)
    schedule = LRSchedule.from_conf(conf)
    input_domain = "time" if args.model == "ConvTasNet" else "stft"
    trainer = Trainer(model, objective, schedule, optim=args.optim,
                      weight_decay=args.weight_decay,
                      grad_thresh=args.grad_thresh,
                      input_domain=input_domain, ipd_index=train_ipd)

    probe = None
    if args.probe_sessions > 0:
        from css_tpu.trainer.probe import HeldOutProbe

        # probe mode per model family (round-3 VERDICT: the val-loss
        # fallback is anti-correlated with held-out quality — never
        # silently fall back for spatialized/time-domain models)
        if input_domain != "stft":
            probe_mode, probe_ipd = "time", None
        elif args.spatialize_channels:
            probe_mode, probe_ipd = "spatial", train_ipd
        else:
            probe_mode, probe_ipd = "mask", None
        voice = getattr(args, "synthetic_voice", "harmonic")
        probe_corpus = SyntheticCorpus(
            num_speakers=args.probe_speakers,
            utts_per_speaker=args.probe_utts,
            seed=args.probe_seed, f0_max=args.synthetic_f0_max,
            voice=voice)
        probe = HeldOutProbe(
            probe_corpus, sessions=args.probe_sessions,
            session_sec=args.probe_session_sec, seed=args.probe_seed,
            num_spk=int(conf.get("num_spk", 2) or 2),
            mode=probe_mode, ipd_index=probe_ipd,
            noise_level=args.sensor_noise_level,
            stratify_f0=args.probe_stratify_f0)
    if args.average_probe_top > 0 and probe is None:
        raise SystemExit("--average-probe-top requires --probe-sessions > 0")

    from css_tpu.trainer.loop import training_rng

    rng = training_rng(args.seed, args.prng_impl)
    example = next(dataset)
    # re-feed the consumed example so no batch is lost and the loader's
    # same-shape runs stay aligned for multi-step dispatch grouping
    dataset = itertools.chain([dict(example)], dataset)
    # device-resident audio pools (device-mix mode): shipped to HBM once,
    # passed to every step so the compiled program slices them in place.
    # Mesh strategies replicate host_pools over the mesh themselves — a
    # default-device copy would just pin duplicate HBM
    pools = (dmix.device_pools()
             if dmix and args.strategy == "single" else None)
    dev_pools = dev_dmix.device_pools() if dev_dmix else None

    strategy = None
    if args.strategy == "dp":
        from css_tpu.parallel import DataParallel, conformer_tp_spec, make_mesh

        mesh = make_mesh(model=args.tp)
        tp_spec = None
        if args.tp > 1:
            if args.model != "Conformer":
                raise SystemExit("--tp>1 currently supports Conformer only")
            tmp = trainer.init_state(
                rng, example, dmix.device_pools() if dmix else None)
            tp_spec = conformer_tp_spec(tmp.params)
        strategy = DataParallel(trainer, mesh, tp_spec=tp_spec,
                                pools=dmix.host_pools if dmix else None)
        state = strategy.init_state(rng, example)
    elif args.strategy == "replica_avg":
        from css_tpu.parallel import ReplicaAveraging, make_mesh

        strategy = ReplicaAveraging(trainer, make_mesh(),
                                    num_replicas=args.num_replicas,
                                    pools=dmix.host_pools if dmix else None)
        rngs = jax.random.split(rng, strategy.num_replicas)
        per = {k: v[: max(1, args.batch_size // strategy.num_replicas)]
               for k, v in example.items() if hasattr(v, "ndim") and v.ndim}
        state = strategy.init_state(rngs, per)
    else:
        state = trainer.init_state(rng, example, pools)

    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(state.params))
    log.info("Training %s with %d parameters (%s strategy on %d devices)",
             args.model, n_params, args.strategy, jax.device_count())

    start_epoch = 0
    if args.resume is not None:
        ckpt = checkpoint.load_checkpoint(expdir / args.resume)
        state = checkpoint.restore_state(ckpt, state)
        start_epoch = ckpt["epoch"]
        log.info("Resumed from %s at epoch %d", args.resume, start_epoch)
    if args.init is not None:
        ckpt = checkpoint.load_checkpoint(args.init)
        state = state.replace(params=jax.tree.map(
            jax.numpy.asarray,
            checkpoint.warm_start(
                jax.tree.map(np.asarray, state.params), ckpt["params"],
                replace_output=args.replace_output)))
        log.info("Warm-started from %s (replace_output=%s)", args.init,
                 args.replace_output)

    metrics_log = (MetricsLogger(expdir / f"train.{args.job}.jsonl",
                                 echo_every=50) if is_lead else None)
    best_val = float("inf")
    best_probe = float("-inf")
    probe_top = []  # [(probe_si_snri, epoch, path)] highest-N probe epochs
    profiling = False
    if args.profile_dir and is_lead:
        jax.profiler.start_trace(args.profile_dir)
        profiling = True
    for e in range(start_epoch, start_epoch + args.num_epochs):
        if args.strategy == "replica_avg":
            # independent replica epochs + averaging (train_parallel.sh:56-77),
            # optionally ramping the number of ACTIVE replicas like the
            # reference ramps SGE job counts (train_parallel.sh:57)
            nj = strategy.num_replicas
            if args.nj_init:
                frac = (e - start_epoch + 1) / max(args.num_epochs, 1)
                nj = min(strategy.num_replicas, max(
                    args.nj_init,
                    int(args.nj_init
                        + frac * (strategy.num_replicas - args.nj_init))))
            alive = np.zeros(strategy.num_replicas, bool)
            alive[:nj] = True
            it = iter(dataset)
            losses = []
            rng, epoch_rng = jax.random.split(rng)
            for i in range(args.batches_per_epoch):
                batch = next(it)
                batch.pop("ovl", None); batch.pop("lens", None)
                state, m = strategy.train_step(state, batch, epoch_rng)
                losses.append(m["loss"])  # device array, no per-step sync
            state = strategy.average(state, alive=alive)
            avg_loss = float(jax.numpy.mean(
                jax.numpy.stack(losses)[:, :nj]))
        elif args.strategy == "dp":
            it = iter(dataset)
            losses = []
            rng, epoch_rng = jax.random.split(rng)
            for i in range(args.batches_per_epoch):
                batch = next(it)
                batch.pop("ovl", None); batch.pop("lens", None)
                state, m = strategy.train_step(state, batch, epoch_rng)
                losses.append(m["loss"])  # device scalar, no per-step sync
            avg_loss = float(jax.numpy.mean(jax.numpy.stack(losses)))
        else:
            # advance the root key per epoch — train_one_epoch splits a local
            # copy, so reusing `rng` would replay the identical per-step
            # dropout sequence every epoch
            rng, epoch_rng = jax.random.split(rng)
            state, avg_loss = trainer.train_one_epoch(
                state, dataset, args.batches_per_epoch, epoch_rng, metrics_log,
                steps_per_dispatch=args.steps_per_dispatch, pools=pools)

        t_val = _time.perf_counter()
        val = None
        val_state = (strategy.replica_state(state)
                     if args.strategy == "replica_avg" else state)
        if dev_dataset is not None:
            val = trainer.validate(val_state, dev_dataset,
                                   num_batches=args.validate_batches,
                                   pools=dev_pools)
            log.info("Epoch %d :: train loss %.5f valid loss %.5f "
                     "(validate %.1fs)", e + 1, avg_loss, val,
                     _time.perf_counter() - t_val)
        else:
            log.info("Epoch %d :: train loss %.5f", e + 1, avg_loss)
        probe_val = None
        if probe is not None:
            variables = {"params": val_state.params}
            if val_state.batch_stats:
                variables["batch_stats"] = val_state.batch_stats
            probe_val = probe(model, variables)
            log.info("Epoch %d :: held-out probe SI-SNRi %+.3f dB",
                     e + 1, probe_val)
            if metrics_log is not None:
                metrics_log({"epoch": e + 1,
                             "probe_si_snri_db": float(probe_val)})
        if (args.average_probe_top > 0 and is_lead
                and probe_val is not None and np.isfinite(probe_val)):
            n_top = args.average_probe_top
            if len(probe_top) < n_top or probe_val > probe_top[-1][0]:
                p = expdir / f"ptop.{e + 1}.{args.job}.mdl"
                checkpoint.save_checkpoint(
                    p, val_state, epoch=e + 1,
                    loss=float(val if val is not None else avg_loss),
                    conf={k: v for k, v in conf.items()
                          if isinstance(v, (str, int, float, bool,
                                            type(None)))},
                    extra={"probe_si_snri_db": float(probe_val)})
                probe_top.append((float(probe_val), e + 1, p))
                probe_top.sort(key=lambda t: -t[0])
                while len(probe_top) > n_top:
                    probe_top.pop()[2].unlink(missing_ok=True)
        if args.keep_best and is_lead:
            # selection metric: held-out probe SI-SNRi when available
            # (higher is better) — val MSE is anti-correlated with
            # held-out quality (BASELINE.md round 2); else val loss
            improved = False
            if probe_val is not None and np.isfinite(probe_val):
                if probe_val > best_probe:
                    best_probe = probe_val
                    improved = True
                    log.info("New best probe SI-SNRi %+.3f dB (epoch %d)",
                             probe_val, e + 1)
            elif val is not None and np.isfinite(val) and val < best_val:
                best_val = val
                improved = True
                log.info("New best validation loss %.5f (epoch %d)",
                         val, e + 1)
            if improved:
                extra = ({"probe_si_snri_db": float(probe_val)}
                         if probe_val is not None else None)
                checkpoint.save_checkpoint(
                    expdir / f"best.{args.job}.mdl", val_state,
                    epoch=e + 1,
                    loss=float(val if val is not None else avg_loss),
                    conf={k: v for k, v in conf.items()
                          if isinstance(v, (str, int, float, bool,
                                            type(None)))},
                    extra=extra)

        if profiling:  # capture exactly one epoch
            jax.profiler.stop_trace()
            profiling = False
            log.info("Profiler trace written to %s", args.profile_dir)

        if is_lead and not np.isnan(avg_loss):
            # NaN epochs not checkpointed (train.py:313)
            t_save = _time.perf_counter()
            save_state = (strategy.replica_state(state)
                          if args.strategy == "replica_avg" else state)
            checkpoint.save_checkpoint(
                expdir / f"{e + 1}.{args.job}.mdl", save_state,
                epoch=e + 1, loss=avg_loss,
                conf={k: v for k, v in conf.items()
                      if isinstance(v, (str, int, float, bool, type(None)))})
            checkpoint.gc_checkpoints(expdir, keep_every=args.keep_every,
                                      keep_last=args.keep_last, job=args.job)
            log.info("Checkpoint %d.%d saved (%.1fs)", e + 1, args.job,
                     _time.perf_counter() - t_save)
    if args.average_probe_top > 0 and probe_top and is_lead:
        # the measured-winning selection recipe (BASELINE.md avg23):
        # probe-select, then average the probe-top checkpoints — all from
        # one run, hence one basin (round 2 measured cross-basin
        # averaging HURTING)
        merged = checkpoint.average_checkpoints(
            [str(p) for _, _, p in probe_top])
        out = expdir / f"avgtop.{args.job}.mdl"
        checkpoint.save_checkpoint_dict(str(out), merged)
        variables = {"params": jax.tree.map(jax.numpy.asarray,
                                            merged["params"])}
        if merged.get("batch_stats"):
            variables["batch_stats"] = jax.tree.map(
                jax.numpy.asarray, merged["batch_stats"])
        avg_probe = probe(model, variables)
        log.info("avgtop.%d.mdl: averaged %d probe-top epochs %s "
                 "(probe %s) -> probe SI-SNRi %+.3f dB", args.job,
                 len(probe_top), [e for _, e, _ in probe_top],
                 ["%+.2f" % v for v, _, _ in probe_top], avg_probe)
        best_val, best_epoch, best_path = probe_top[0]
        if not np.isfinite(avg_probe):
            # probe failure on the average: treat as "worse" so the
            # guard ships the best single epoch instead of silently
            # publishing an unprobed average (ADVICE r4)
            log.warning("avgtop.%d.mdl: probe of the average is "
                        "non-finite (%s) — treating as worse than best "
                        "single epoch", args.job, avg_probe)
        if not np.isfinite(avg_probe) or avg_probe < best_val:
            # cross-basin guard: top-N epochs far apart in training can
            # sit in different basins, where averaging HURTS (round 2;
            # g2 round 4: epochs [6,19] probe +6.04/+6.02 -> avg +4.60).
            # The probe arbitrates: ship the best single epoch instead
            best_ckpt = checkpoint.load_checkpoint(str(best_path))
            checkpoint.save_checkpoint_dict(str(out), best_ckpt)
            log.info("avgtop.%d.mdl: average (%+.3f) probes WORSE than "
                     "best single epoch %d (%+.3f) — cross-basin guard "
                     "ships the single epoch", args.job, avg_probe,
                     best_epoch, best_val)
            avg_probe, avg_epochs = best_val, [best_epoch]
        else:
            avg_epochs = [e for _, e, _ in probe_top]
        if metrics_log is not None:
            metrics_log({"avgtop_epochs": avg_epochs,
                         "avgtop_probe_si_snri_db": float(avg_probe)})
        for _, _, p in probe_top:
            p.unlink(missing_ok=True)
    if metrics_log is not None:
        metrics_log.close()
    log.info("Done.")


if __name__ == "__main__":
    main()
