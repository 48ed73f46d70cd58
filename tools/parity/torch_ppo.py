"""SB3-default PPO in torch for the parity harness's reference side.

stable-baselines3 is not installed in this image, so the reference
learner (train.py:122-136 -> sb3 PPO(MlpPolicy)) is reimplemented here to
its published defaults, which the reference uses unchanged except
learning_rate (train.py:220):

  MlpPolicy: separate pi/vf 2x64 tanh MLPs, orthogonal init (sqrt(2)
  hidden, 0.01 action head, 1.0 value head), state-independent log_std
  initialized to 0; Adam(lr, eps=1e-5); n_steps 2048, minibatch 64,
  10 epochs, gamma 0.99, gae_lambda 0.95, clip 0.2, vf_coef 0.5,
  ent_coef 0.0, max_grad_norm 0.5; per-minibatch advantage
  normalization; TimeLimit bootstrap adds gamma*V(terminal_obs) to the
  truncating step's reward (sb3 OnPolicyAlgorithm.collect_rollouts).

The repo's JAX PPO pins the same conventions (tests/test_learn.py); this
torch implementation is the independent executable on the reference's
compute stack (torch, requirements.txt:141).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn


def _mlp():
    return nn.Sequential(
        nn.Linear(48, 64), nn.Tanh(), nn.Linear(64, 64), nn.Tanh()
    )


class Policy(nn.Module):
    def __init__(self):
        super().__init__()
        self.pi = _mlp()
        self.vf = _mlp()
        self.action_head = nn.Linear(64, 12)
        self.value_head = nn.Linear(64, 1)
        self.log_std = nn.Parameter(torch.zeros(12))
        for m in list(self.pi) + list(self.vf):
            if isinstance(m, nn.Linear):
                nn.init.orthogonal_(m.weight, np.sqrt(2))
                nn.init.zeros_(m.bias)
        nn.init.orthogonal_(self.action_head.weight, 0.01)
        nn.init.zeros_(self.action_head.bias)
        nn.init.orthogonal_(self.value_head.weight, 1.0)
        nn.init.zeros_(self.value_head.bias)

    def forward(self, obs):
        mean = self.action_head(self.pi(obs))
        value = self.value_head(self.vf(obs)).squeeze(-1)
        return mean, self.log_std, value

    def dist(self, obs):
        mean, log_std, value = self(obs)
        return torch.distributions.Normal(mean, log_std.exp()), value


class PPO:
    def __init__(self, envs, lr=3e-4, n_steps=2048, batch_size=64,
                 n_epochs=10, gamma=0.99, gae_lambda=0.95, clip=0.2,
                 vf_coef=0.5, ent_coef=0.0, max_grad_norm=0.5, seed=0):
        torch.manual_seed(seed)
        self.envs = envs
        self.n = len(envs)
        self.policy = Policy()
        self.opt = torch.optim.Adam(self.policy.parameters(), lr=lr, eps=1e-5)
        self.n_steps = n_steps
        self.batch_size = batch_size
        self.n_epochs = n_epochs
        self.gamma = gamma
        self.lam = gae_lambda
        self.clip = clip
        self.vf_coef = vf_coef
        self.ent_coef = ent_coef
        self.max_grad_norm = max_grad_norm
        self.obs = np.stack([e.reset() for e in envs])
        self.rng = np.random.default_rng(seed)

    @torch.no_grad()
    def _act(self, obs):
        dist, value = self.policy.dist(torch.as_tensor(obs, dtype=torch.float32))
        action = dist.sample()
        logp = dist.log_prob(action).sum(-1)
        return action.numpy(), logp.numpy(), value.numpy()

    def collect(self):
        T, N = self.n_steps, self.n
        obs_buf = np.zeros((T, N, 48), np.float32)
        act_buf = np.zeros((T, N, 12), np.float32)
        logp_buf = np.zeros((T, N), np.float32)
        val_buf = np.zeros((T, N), np.float32)
        rew_buf = np.zeros((T, N), np.float32)
        start_buf = np.zeros((T, N), np.float32)  # episode_starts (sb3)
        ep_starts = np.zeros(N, np.float32)
        total_r, total_steps = 0.0, 0
        for t in range(T):
            a, logp, v = self._act(self.obs)
            obs_buf[t] = self.obs
            act_buf[t] = a
            logp_buf[t] = logp
            val_buf[t] = v
            start_buf[t] = ep_starts
            for i, e in enumerate(self.envs):
                o2, r, term, trunc, _ = e.step(a[i])
                if trunc and not term:
                    # sb3 TimeLimit bootstrap
                    with torch.no_grad():
                        _, _, tv = self.policy(
                            torch.as_tensor(o2, dtype=torch.float32)
                        )
                    r = r + self.gamma * float(tv)
                rew_buf[t, i] = r
                ep_starts[i] = float(term or trunc)
                self.obs[i] = e.reset() if (term or trunc) else o2
                total_r += r
            total_steps += N
        with torch.no_grad():
            _, _, last_v = self.policy(
                torch.as_tensor(self.obs, dtype=torch.float32)
            )
        adv = np.zeros((T, N), np.float32)
        gae = np.zeros(N, np.float32)
        next_v = last_v.numpy()
        next_nonterm = 1.0 - ep_starts
        for t in reversed(range(T)):
            delta = rew_buf[t] + self.gamma * next_v * next_nonterm - val_buf[t]
            gae = delta + self.gamma * self.lam * next_nonterm * gae
            adv[t] = gae
            next_v = val_buf[t]
            next_nonterm = 1.0 - start_buf[t]
        ret = adv + val_buf
        return (
            obs_buf.reshape(-1, 48), act_buf.reshape(-1, 12),
            logp_buf.reshape(-1), adv.reshape(-1), ret.reshape(-1),
            total_r / total_steps,
        )

    def update(self, batch):
        obs, act, old_logp, adv, ret = (
            torch.as_tensor(x, dtype=torch.float32) for x in batch
        )
        n = len(obs)
        for _ in range(self.n_epochs):
            perm = self.rng.permutation(n)
            for s in range(0, n, self.batch_size):
                idx = perm[s:s + self.batch_size]
                dist, value = self.policy.dist(obs[idx])
                logp = dist.log_prob(act[idx]).sum(-1)
                a = adv[idx]
                a = (a - a.mean()) / (a.std() + 1e-8)
                ratio = (logp - old_logp[idx]).exp()
                pg = -torch.min(
                    a * ratio,
                    a * ratio.clamp(1 - self.clip, 1 + self.clip),
                ).mean()
                v_loss = ((ret[idx] - value) ** 2).mean()
                ent = dist.entropy().sum(-1).mean()
                loss = pg + self.vf_coef * v_loss - self.ent_coef * ent
                self.opt.zero_grad()
                loss.backward()
                nn.utils.clip_grad_norm_(
                    self.policy.parameters(), self.max_grad_norm
                )
                self.opt.step()

    @torch.no_grad()
    def eval_episodes(self, make_env, n_episodes=2, max_steps=1000, seed=0):
        rews, lens, healthy, track = [], [], [], []
        for ep in range(n_episodes):
            e = make_env(seed + 1000 + ep)
            o = e.reset()
            total, steps, h, te = 0.0, 0, 0, []
            for _ in range(max_steps):
                mean, _, _ = self.policy(torch.as_tensor(o, dtype=torch.float32))
                o, r, term, trunc, info = e.step(mean.numpy())
                total += r
                steps += 1
                h += int(info["healthy"])
                if info["healthy"]:
                    te.append(info["tracking_error"])
                if term or trunc:
                    break
            rews.append(total)
            lens.append(steps)
            healthy.append(h / max(steps, 1))
            track.append(float(np.mean(te)) if te else float("nan"))
        return (
            float(np.mean(rews)), float(np.mean(lens)),
            float(np.mean(healthy)), float(np.nanmean(track)),
        )
