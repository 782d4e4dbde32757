// Re-encode tool: fps-downsampling transcode (decode -> select -> scale ->
// encode -> mux). The hd-vila preprocessing step of re-encoding raw videos
// to 6 fps (hd-vila/scripts/process_raw_video/compress_video.py) without
// shelling out to an ffmpeg binary.
//
// API: xvc_transcode(in, out, target_fps, target_height, codec)
//   target_height <= 0 keeps the source size (width scales to keep aspect,
//   rounded to even); codec NULL/"" tries libx264 then mpeg4 then mjpeg.
//   Returns 0 on success, negative on failure.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <cstring>
#include <initializer_list>

namespace {

const AVCodec* pick_encoder(const char* name) {
  if (name && *name) return avcodec_find_encoder_by_name(name);
  for (const char* cand : {"libx264", "mpeg4", "mjpeg"}) {
    const AVCodec* c = avcodec_find_encoder_by_name(cand);
    if (c) return c;
  }
  return nullptr;
}

AVPixelFormat pick_pix_fmt(const AVCodec* enc) {
  if (!enc->pix_fmts) return AV_PIX_FMT_YUV420P;
  return enc->pix_fmts[0];
}

}  // namespace

extern "C" int xvc_transcode(const char* in_path, const char* out_path,
                             double target_fps, int target_height,
                             const char* codec_name) {
  av_log_set_level(AV_LOG_ERROR);
  int ret = -1;
  AVFormatContext* in = nullptr;
  if (avformat_open_input(&in, in_path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(in, nullptr) < 0) {
    avformat_close_input(&in);
    return -2;
  }
  const AVCodec* dec = nullptr;
  int vstream = av_find_best_stream(in, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (vstream < 0) {
    avformat_close_input(&in);
    return -3;
  }
  AVStream* ist = in->streams[vstream];
  AVCodecContext* dctx = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(dctx, ist->codecpar);
  dctx->thread_count = 0;
  if (avcodec_open2(dctx, dec, nullptr) < 0) goto cleanup_dec;

  {
    int out_h = target_height > 0 ? target_height : dctx->height;
    int out_w = target_height > 0
                    ? ((dctx->width * target_height / dctx->height) / 2) * 2
                    : (dctx->width / 2) * 2;
    out_h = (out_h / 2) * 2;

    const AVCodec* enc = pick_encoder(codec_name);
    if (!enc) goto cleanup_dec;
    AVFormatContext* out = nullptr;
    if (avformat_alloc_output_context2(&out, nullptr, nullptr, out_path) < 0)
      goto cleanup_dec;
    AVStream* ost = avformat_new_stream(out, nullptr);
    AVCodecContext* ectx = avcodec_alloc_context3(enc);
    ectx->width = out_w;
    ectx->height = out_h;
    ectx->pix_fmt = pick_pix_fmt(enc);
    ectx->time_base = av_d2q(1.0 / target_fps, 100000);
    ectx->framerate = av_d2q(target_fps, 100000);
    if (ectx->pix_fmt == AV_PIX_FMT_YUVJ420P) ectx->color_range = AVCOL_RANGE_JPEG;
    if (out->oformat->flags & AVFMT_GLOBALHEADER)
      ectx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (!strcmp(enc->name, "libx264")) av_opt_set(ectx->priv_data, "preset", "fast", 0);
    if (avcodec_open2(ectx, enc, nullptr) < 0) {
      avcodec_free_context(&ectx);
      avformat_free_context(out);
      goto cleanup_dec;
    }
    avcodec_parameters_from_context(ost->codecpar, ectx);
    ost->time_base = ectx->time_base;
    if (!(out->oformat->flags & AVFMT_NOFILE) &&
        avio_open(&out->pb, out_path, AVIO_FLAG_WRITE) < 0) {
      avcodec_free_context(&ectx);
      avformat_free_context(out);
      goto cleanup_dec;
    }
    if (avformat_write_header(out, nullptr) < 0) goto cleanup_all;

    {
      SwsContext* sws = sws_getContext(dctx->width, dctx->height, dctx->pix_fmt,
                                       out_w, out_h, ectx->pix_fmt, SWS_BILINEAR,
                                       nullptr, nullptr, nullptr);
      AVFrame* frame = av_frame_alloc();
      AVFrame* oframe = av_frame_alloc();
      oframe->format = ectx->pix_fmt;
      oframe->width = out_w;
      oframe->height = out_h;
      av_frame_get_buffer(oframe, 0);
      AVPacket* pkt = av_packet_alloc();
      AVPacket* opkt = av_packet_alloc();
      int64_t next_out_index = 0;
      double tb = av_q2d(ist->time_base);
      int64_t start_pts = AV_NOPTS_VALUE;

      auto drain_encoder = [&](bool flush) {
        if (flush) avcodec_send_frame(ectx, nullptr);
        while (avcodec_receive_packet(ectx, opkt) == 0) {
          av_packet_rescale_ts(opkt, ectx->time_base, ost->time_base);
          opkt->stream_index = 0;
          av_interleaved_write_frame(out, opkt);
          av_packet_unref(opkt);
        }
      };

      while (av_read_frame(in, pkt) >= 0) {
        if (pkt->stream_index == vstream) {
          avcodec_send_packet(dctx, pkt);
          while (avcodec_receive_frame(dctx, frame) == 0) {
            int64_t pts = frame->best_effort_timestamp;
            if (pts == AV_NOPTS_VALUE) pts = 0;
            if (start_pts == AV_NOPTS_VALUE) start_pts = pts;
            double secs = (pts - start_pts) * tb;
            // emit a frame whenever source time crosses the output grid
            if (secs * target_fps >= static_cast<double>(next_out_index)) {
              av_frame_make_writable(oframe);
              sws_scale(sws, frame->data, frame->linesize, 0, dctx->height,
                        oframe->data, oframe->linesize);
              oframe->pts = next_out_index++;
              avcodec_send_frame(ectx, oframe);
              drain_encoder(false);
            }
            av_frame_unref(frame);
          }
        }
        av_packet_unref(pkt);
      }
      // flush decoder
      avcodec_send_packet(dctx, nullptr);
      while (avcodec_receive_frame(dctx, frame) == 0) av_frame_unref(frame);
      drain_encoder(true);
      av_write_trailer(out);
      ret = next_out_index > 0 ? 0 : -6;

      av_packet_free(&pkt);
      av_packet_free(&opkt);
      av_frame_free(&frame);
      av_frame_free(&oframe);
      sws_freeContext(sws);
    }

  cleanup_all:
    if (!(out->oformat->flags & AVFMT_NOFILE)) avio_closep(&out->pb);
    avcodec_free_context(&ectx);
    avformat_free_context(out);
  }

cleanup_dec:
  avcodec_free_context(&dctx);
  avformat_close_input(&in);
  return ret;
}
