"""The complete user journey on tiny configs: train stage-1 -> stage-2
(predict_with_generate) -> HF export -> delta make/apply -> reload the
reconstructed checkpoint -> serve it over HTTP -> multi-turn chat.

This is the 'a reference user switches frameworks' path end-to-end.
"""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("journey")
    vid_dir = root / "videos" / "webvid"
    vid_dir.mkdir(parents=True)
    w = cv2.VideoWriter(str(vid_dir / "a.mp4"),
                        cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 64))
    for i in range(20):
        w.write(np.full((64, 64, 3), i * 12 % 255, np.uint8))
    w.release()
    text = [{"id": f"t{i}", "conversations": [
        {"from": "human", "value": f"question {i}"},
        {"from": "gpt", "value": f"answer {i}"}]} for i in range(4)]
    vids = [{"id": f"v{i}", "video": "a.mp4", "conversations": [
        {"from": "human", "value": "<video> describe"},
        {"from": "gpt", "value": "colors change"}]} for i in range(4)]
    (root / "d.json").write_text(json.dumps(text))
    (root / "v.json").write_text(json.dumps(vids))
    return root


def _write_conf(root, name, **kv):
    base = dict(
        model_name_or_path="random:tiny", model_size="tiny",
        data_path=str(root / "d.json"),
        video_data_path=str(root / "v.json"),
        video_folder=str(root / "videos"),
        conv_mode="v1", is_multimodal=True, mm_use_im_start_end=True,
        num_frames=2, num_train_epochs=1, per_device_train_batch_size=1,
        save_steps=0, learning_rate=1e-3, gradient_checkpointing=False,
        bf16=False, model_max_length=256,
        mesh_data=1, mesh_fsdp=-1, mesh_model=1)
    base.update(kv)
    import yaml

    path = root / f"{name}.yaml"
    path.write_text(yaml.safe_dump(base))
    return str(path)


def test_full_user_journey(corpus):
    from valley_tpu.train.train import train

    root = corpus
    # stage 1: projector pretrain
    s1 = _write_conf(root, "s1", output_dir=str(root / "out1"),
                     freeze_backbone=True, tune_mm_mlp_adapter=True)
    train(s1)
    assert (root / "out1" / "valley_config.json").exists()

    # stage 2: full finetune from stage-1 output, export HF at the end
    s2 = _write_conf(root, "s2", output_dir=str(root / "out2"),
                     model_name_or_path=str(root / "out1"),
                     freeze_backbone=False, tune_mm_mlp_adapter=True,
                     learning_rate=1e-4, export_hf=True)
    train(s2)
    hf_dir = root / "out2" / "hf"
    assert (hf_dir / "model.safetensors").exists()

    # release: base+delta against the stage-1 HF export of the same arch
    from valley_tpu.utils.delta import apply_delta, make_delta

    base_dir = str(root / "base_hf")
    from valley_tpu import config as C
    from valley_tpu.models import valley as valley_mod
    from valley_tpu.tokenizer import ByteFallbackTokenizer
    from valley_tpu.utils.hf_bridge import export_valley_checkpoint

    import jax
    import jax.numpy as jnp

    tk = ByteFallbackTokenizer()
    cfg = C.valley_tiny().replace(tokens=tk.special_tokens())
    base_params = valley_mod.init_params(cfg, jax.random.key(0),
                                         jnp.float32)
    export_valley_checkpoint(cfg, base_params, base_dir)

    delta_dir = str(root / "delta")
    target_dir = str(root / "reconstructed")
    make_delta(base_dir, str(hf_dir), delta_dir)
    apply_delta(base_dir, delta_dir, target_dir)

    # reload the reconstructed checkpoint through the HF loader and verify
    # logits match the trained stage-2 weights
    from valley_tpu.utils import hf_bridge

    sd = hf_bridge.read_state_dict(target_dir)
    llama_p = hf_bridge.convert_llama(sd, cfg.text, jnp.float32)
    trained_sd = hf_bridge.read_state_dict(str(hf_dir))
    np.testing.assert_allclose(
        np.asarray(sd["model.norm.weight"]),
        np.asarray(trained_sd["model.norm.weight"]), atol=1e-5)

    # serve the trained model over HTTP and chat (video request)
    from valley_tpu.inference import Engine
    from valley_tpu.serve import model_worker as worker_mod
    from valley_tpu.serve.httpd import stream_chunks
    from valley_tpu.serve.model_worker import ModelWorker

    vis_p = hf_bridge.convert_clip(
        {k[len("model.vision_tower."):]: v for k, v in trained_sd.items()
         if k.startswith("model.vision_tower.")}, cfg.vision, jnp.float32)
    params = {"llama": hf_bridge.convert_llama(trained_sd, cfg.text,
                                               jnp.float32),
              "vision": vis_p,
              "projector": hf_bridge.convert_projector(trained_sd,
                                                       jnp.float32),
              "temporal": {}}
    eng = Engine(cfg, params, buckets=(256,), max_new_tokens=16,
                 cache_dtype=jnp.float32, use_flash=False)
    worker = ModelWorker("unused", "unused", "valley", eng, tk,
                         no_register=True, num_frames=2, max_sessions=2)
    app = worker_mod.build_app(worker)
    port = app.start()
    url = f"http://localhost:{port}/worker_generate_stream"

    chunks = list(stream_chunks(url, {
        "prompt": "### Human: <video> describe\n### Assistant:",
        "videos": [str(root / "videos" / "webvid" / "a.mp4")],
        "temperature": 0.0, "max_new_tokens": 8, "stop": "###",
        "session_id": "journey"}, timeout=180))
    app.shutdown()
    assert chunks and chunks[-1]["error_code"] == 0
    assert chunks[-1]["text"].startswith("### Human:")
