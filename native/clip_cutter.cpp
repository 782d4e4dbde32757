// Stream-copy clip extraction (no re-encode): the hd-vila-100m tooling's
// `ffmpeg -ss .. -to .. -c copy` (hd-vila-100m/src/cut_videos.py:55-62)
// implemented directly on libavformat — demux packets, keep those inside
// [start, end) seconds (rebased), mux to the output container.
//
// API: xvc_cut(in_path, out_path, start_s, end_s) -> 0 on success.

extern "C" {
#include <libavformat/avformat.h>
#include <libavutil/avutil.h>
}

#include <cstring>
#include <vector>

extern "C" int xvc_cut(const char* in_path, const char* out_path, double start_s,
                       double end_s) {
  av_log_set_level(AV_LOG_ERROR);
  AVFormatContext* in = nullptr;
  if (avformat_open_input(&in, in_path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(in, nullptr) < 0) {
    avformat_close_input(&in);
    return -2;
  }
  AVFormatContext* out = nullptr;
  if (avformat_alloc_output_context2(&out, nullptr, nullptr, out_path) < 0) {
    avformat_close_input(&in);
    return -3;
  }
  std::vector<int> map(in->nb_streams, -1);
  int next = 0;
  for (unsigned i = 0; i < in->nb_streams; ++i) {
    AVCodecParameters* par = in->streams[i]->codecpar;
    if (par->codec_type != AVMEDIA_TYPE_VIDEO && par->codec_type != AVMEDIA_TYPE_AUDIO &&
        par->codec_type != AVMEDIA_TYPE_SUBTITLE)
      continue;
    AVStream* os = avformat_new_stream(out, nullptr);
    if (!os) continue;
    avcodec_parameters_copy(os->codecpar, par);
    os->codecpar->codec_tag = 0;
    os->time_base = in->streams[i]->time_base;
    os->avg_frame_rate = in->streams[i]->avg_frame_rate;
    os->r_frame_rate = in->streams[i]->r_frame_rate;
    map[i] = next++;
  }
  if (!(out->oformat->flags & AVFMT_NOFILE)) {
    if (avio_open(&out->pb, out_path, AVIO_FLAG_WRITE) < 0) {
      avformat_free_context(out);
      avformat_close_input(&in);
      return -4;
    }
  }
  if (avformat_write_header(out, nullptr) < 0) {
    if (!(out->oformat->flags & AVFMT_NOFILE)) avio_closep(&out->pb);
    avformat_free_context(out);
    avformat_close_input(&in);
    return -5;
  }
  // seek near the start (keyframe before it) for speed
  int64_t seek_ts = static_cast<int64_t>(start_s * AV_TIME_BASE);
  av_seek_frame(in, -1, seek_ts, AVSEEK_FLAG_BACKWARD);

  AVPacket* pkt = av_packet_alloc();
  std::vector<int64_t> start_dts(in->nb_streams, AV_NOPTS_VALUE);
  while (av_read_frame(in, pkt) >= 0) {
    unsigned idx = pkt->stream_index;
    if (idx >= map.size() || map[idx] < 0) {
      av_packet_unref(pkt);
      continue;
    }
    AVStream* is = in->streams[idx];
    double t = (pkt->pts == AV_NOPTS_VALUE ? pkt->dts : pkt->pts) * av_q2d(is->time_base);
    if (t >= end_s) {
      av_packet_unref(pkt);
      if (is->codecpar->codec_type == AVMEDIA_TYPE_VIDEO) break;
      continue;
    }
    if (t < start_s) {
      av_packet_unref(pkt);
      continue;
    }
    AVStream* os = out->streams[map[idx]];
    if (start_dts[idx] == AV_NOPTS_VALUE)
      start_dts[idx] = pkt->dts != AV_NOPTS_VALUE ? pkt->dts : pkt->pts;
    // rebase timestamps so the clip starts near zero
    if (pkt->pts != AV_NOPTS_VALUE) pkt->pts -= start_dts[idx];
    if (pkt->dts != AV_NOPTS_VALUE) pkt->dts -= start_dts[idx];
    av_packet_rescale_ts(pkt, is->time_base, os->time_base);
    pkt->stream_index = map[idx];
    pkt->pos = -1;
    av_interleaved_write_frame(out, pkt);
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  av_write_trailer(out);
  if (!(out->oformat->flags & AVFMT_NOFILE)) avio_closep(&out->pb);
  avformat_free_context(out);
  avformat_close_input(&in);
  return 0;
}
