"""HF-hub publish: push contract against a local hub mock.

The reference pushes stripped checkpoints + model card to the Hub
(publish/push_to_hf.py:170-196); cli/publish.py mirrors that via
``--push hf://org/repo``.  Zero-egress environment -> HfApi is mocked.
"""

import json

import pytest


class _MockHfApi:
    calls = []

    def create_repo(self, repo_id, repo_type=None, private=False, exist_ok=False):
        _MockHfApi.calls.append(
            ("create_repo", repo_id, repo_type, private, exist_ok)
        )

    def upload_folder(self, repo_id, folder_path, repo_type=None,
                      commit_message=None):
        _MockHfApi.calls.append(
            ("upload_folder", repo_id, folder_path, repo_type, commit_message)
        )


def test_push_to_hf_contract(tmp_path, monkeypatch):
    import huggingface_hub

    from add_gym_tpu.cli import publish

    monkeypatch.setattr(huggingface_hub, "HfApi", _MockHfApi)
    _MockHfApi.calls = []

    # a hub-ready artifact dir (what export() produces)
    (tmp_path / "model.msgpack").write_bytes(b"\x00")
    (tmp_path / "README.md").write_text("---\nlicense: mit\n---\n# m\n")
    (tmp_path / "metadata.json").write_text(json.dumps({"iter": 1234}))

    url = publish.push_to_hf(str(tmp_path), "org/my-g1", private=True)

    assert url == "https://huggingface.co/org/my-g1"
    kinds = [c[0] for c in _MockHfApi.calls]
    assert kinds == ["create_repo", "upload_folder"]
    create = _MockHfApi.calls[0]
    assert create[1] == "org/my-g1" and create[2] == "model"
    assert create[3] is True and create[4] is True  # private, exist_ok
    up = _MockHfApi.calls[1]
    assert up[1] == "org/my-g1" and up[2] == str(tmp_path)
    assert "iter 1234" in up[4]


def test_model_card_has_hub_frontmatter():
    from add_gym_tpu.cli.publish import MODEL_CARD

    card = MODEL_CARD.format(
        name="n", actor_net="a", critic_net="c", disc_net="d",
        sample_count=1, obs_dim=2, action_dim=3,
    )
    head = card.split("---")[1]
    assert "license:" in head and "library_name: jax" in head
    assert "reinforcement-learning" in head
